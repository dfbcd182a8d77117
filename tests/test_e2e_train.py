"""End-to-end (raw-audio) training tests: STFT inside the train step."""

import os

import numpy as np
import jax.numpy as jnp
import optax
import pytest

from convsep_tpu.data import sine_mixture, write_wav
from convsep_tpu.data.audio_dataset import AudioSegmentDataset, segment_samples
from convsep_tpu.train.e2e import make_audio_train_step
from convsep_tpu.train.loop import create_train_state
from convsep_tpu.train.optim import lasagne_adadelta
from tests.test_train import tiny_train_preset

FS = 8000


@pytest.fixture(scope="module")
def preset():
    return tiny_train_preset()


@pytest.fixture(scope="module")
def audio_root(tmp_path_factory, preset):
    root = tmp_path_factory.mktemp("audio")
    for i in range(2):
        d = root / f"t{i}"
        d.mkdir()
        stems, mix = sine_mixture(2, 2 * FS, fs=FS, freqs=(220.0, 1400.0), seed=i)
        write_wav(d / "vocals.wav", FS, stems[0])
        write_wav(d / "accompaniment.wav", FS, stems[1])
        write_wav(d / "mixture.wav", FS, mix)
    return str(root)


def test_segment_samples(preset):
    # T=10, hop=128 → (10-2)*128
    assert segment_samples(preset) == 8 * 128


def test_audio_dataset_shapes(audio_root, preset):
    seg = segment_samples(preset)
    ds = AudioSegmentDataset(audio_root, ("vocals", "accompaniment"), seg, fs=FS)
    assert len(ds) > 4
    mix, stems = ds.get(0)
    assert mix.shape == (seg,) and stems.shape == (2, seg)
    np.testing.assert_allclose(mix, stems.sum(0), atol=2e-3)  # wav-quantized sum
    x, y = next(ds.batches(4, shuffle=True, seed=0))
    assert x.shape == (4, seg) and y.shape == (4, 2, seg)


def test_audio_train_loss_decreases(audio_root, preset):
    seg = segment_samples(preset)
    ds = AudioSegmentDataset(
        audio_root, ("vocals", "accompaniment"), seg, overlap_samples=seg // 2, fs=FS
    )
    state, opt = create_train_state(preset, 0)
    step = make_audio_train_step(preset, opt)
    # per-batch losses are noisy on the tiny fixture and adadelta (lr=1)
    # over-shoots — compare EPOCH MEANS with a margin (as the stereo e2e
    # test does) instead of single first/last batch losses
    epoch_means = []
    for epoch in range(4):
        losses = []
        for mix, stems in ds.batches(4, shuffle=True, seed=epoch):
            state, m = step(state, jnp.asarray(mix), jnp.asarray(stems))
            losses.append(float(m["loss"]))
        epoch_means.append(float(np.mean(losses)))
    assert np.isfinite(epoch_means).all()
    assert min(epoch_means[1:]) < 0.9 * epoch_means[0], (
        f"e2e loss did not decrease: epoch means {epoch_means}"
    )


def test_audio_train_multires_loss_decreases(audio_root, preset):
    """From-audio training with multi-res conditioning: the extra channels
    are computed inside the jitted step from the mix segment itself."""
    import dataclasses

    mr = dataclasses.replace(
        preset,
        transform=dataclasses.replace(preset.transform, multires=(64, 128)),
        model=dataclasses.replace(preset.model, channels_in=3),
    )
    seg = segment_samples(mr)
    ds = AudioSegmentDataset(
        audio_root, ("vocals", "accompaniment"), seg, overlap_samples=seg // 2, fs=FS
    )
    state, opt = create_train_state(mr, 0)
    step = make_audio_train_step(mr, opt)
    epoch_means = []
    for epoch in range(4):
        losses = []
        for mix, stems in ds.batches(4, shuffle=True, seed=epoch):
            state, m = step(state, jnp.asarray(mix), jnp.asarray(stems))
            losses.append(float(m["loss"]))
        epoch_means.append(float(np.mean(losses)))
    assert np.isfinite(epoch_means).all()
    assert min(epoch_means[1:]) < 0.9 * epoch_means[0], (
        f"multires e2e loss did not decrease: epoch means {epoch_means}"
    )


def test_audio_train_step_rejects_bad_segment(audio_root, preset):
    state, opt = create_train_state(preset, 0)
    step = make_audio_train_step(preset, opt)
    with pytest.raises(ValueError, match="segment length"):
        step(state, jnp.zeros((2, 100)), jnp.zeros((2, 2, 100)))


def test_adadelta_used(preset):
    # guard: the e2e path shares the reference-parity optimizer
    state, opt = create_train_state(preset, 0)
    assert isinstance(opt, optax.GradientTransformation)
    assert type(opt.init(jnp.zeros(3))).__name__ == "AdadeltaState"


def test_from_audio_trainer_with_grain_and_validation(audio_root, preset):
    from convsep_tpu.train.loop import Trainer

    seg = segment_samples(preset)
    ds = AudioSegmentDataset(audio_root, ("vocals", "accompaniment"), seg, fs=FS)
    trainer = Trainer(preset, from_audio=True)
    losses = trainer.fit(ds, num_epochs=2, use_grain=True, val_dataset=ds)
    assert len(losses) == 2 and np.isfinite(losses).all()
    v = trainer.evaluate(ds, max_batches=2)
    assert np.isfinite(v)


def test_from_audio_trainer_on_mesh(audio_root, preset):
    """ADVICE r1 (medium): from-audio batches are (B,seg)/(B,S,seg) — the
    mesh batch placer must shard per-leaf leading axes, not assume rank 4."""
    from convsep_tpu.distributed import make_mesh
    from convsep_tpu.train.loop import Trainer

    seg = segment_samples(preset)
    ds = AudioSegmentDataset(audio_root, ("vocals", "accompaniment"), seg, fs=FS)
    mesh = make_mesh(data=2, model=1, devices=None)
    trainer = Trainer(preset, mesh=mesh, from_audio=True)
    losses = trainer.fit(ds, num_epochs=1)
    assert len(losses) == 1 and np.isfinite(losses[0])
    assert np.isfinite(trainer.evaluate(ds, max_batches=2))
