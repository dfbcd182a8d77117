"""Training loop tests: loss-decrease smoke, checkpoint resume, mesh DP.

SURVEY.md §4 'Integration' + 'Distributed w/o cluster' rows.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from convsep_tpu.configs import get_preset
from convsep_tpu.configs.presets import TransformConfig, TrainConfig
from convsep_tpu.data import SegmentDataset, synth_feature_dir
from convsep_tpu.distributed import make_mesh
from convsep_tpu.train.loop import Trainer, create_train_state, make_train_step


def tiny_train_preset(num_epochs=3, batch_size=8, **train_kw):
    p = get_preset("ikala")
    t = TransformConfig(fs=8000, frame_size=256, hop_size=128)
    model = dataclasses.replace(
        p.model,
        time_context=10,
        feat_size=t.bins,
        conv1_filters=4,
        conv1_freq=8,
        conv2_filters=4,
        bottleneck=16,
    )
    kw = dict(
        batch_size=batch_size,
        num_epochs=num_epochs,
        time_context=10,
        overlap=5,
        checkpoint_every_steps=5,
    )
    kw.update(train_kw)
    train = dataclasses.replace(p.train, **kw)
    return dataclasses.replace(p, transform=t, model=model, train=train)


@pytest.fixture(scope="module")
def feature_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("feats")
    synth_feature_dir(
        str(d),
        ("vocals", "accompaniment"),
        num_tracks=3,
        seconds=2.0,
        fs=8000,
        frame_size=256,
        hop_size=128,
    )
    return str(d)


def _dataset(feature_dir, preset):
    return SegmentDataset(
        feature_dir,
        ("vocals", "accompaniment"),
        time_context=preset.train.time_context,
        overlap=preset.train.overlap,
    )


def test_loss_decreases(feature_dir, tmp_path):
    preset = tiny_train_preset(num_epochs=4)
    trainer = Trainer(preset, workdir=str(tmp_path / "run"))
    losses = trainer.fit(_dataset(feature_dir, preset))
    assert len(losses) == 4
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_checkpoint_resume(feature_dir, tmp_path):
    preset = tiny_train_preset(num_epochs=2)
    wd = str(tmp_path / "run")
    t1 = Trainer(preset, workdir=wd)
    t1.fit(_dataset(feature_dir, preset))
    step1 = int(t1.state.step)
    assert step1 > 0

    t2 = Trainer(preset, workdir=wd)
    assert int(t2.state.step) == 0
    resumed = t2.restore()
    assert resumed == step1
    p1 = jax.tree.leaves(t1.state.params)
    p2 = jax.tree.leaves(t2.state.params)
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # training continues from the restored state (num_epochs is the TOTAL
    # epoch budget — mid-epoch resume metadata places us after epoch 2, so
    # ask for a 3rd epoch)
    more = t2.fit(_dataset(feature_dir, preset), num_epochs=3)
    assert int(t2.state.step) > step1 and np.isfinite(more[0])


def test_mesh_data_parallel_matches_single_device(feature_dir):
    """Same batches, same init → sharded step == single-device step."""
    preset = tiny_train_preset(num_epochs=1)
    ds = _dataset(feature_dir, preset)
    batches = list(ds.batches(8, shuffle=True, seed=0))[:3]

    state_a, opt_a = create_train_state(preset, 0)
    step_a = make_train_step(preset, opt_a)
    for x, y in batches:
        state_a, m_a = step_a(state_a, jnp.asarray(x), jnp.asarray(y))
    loss_a = m_a["loss"]

    mesh = make_mesh(data=8, model=1)
    trainer = Trainer(preset, mesh=mesh)
    state_b = trainer.state
    from convsep_tpu.distributed.mesh import batch_sharding

    sh = batch_sharding(mesh, 4)
    for x, y in batches:
        state_b, m_b = trainer.train_step(
            state_b, jax.device_put(x, sh), jax.device_put(y, sh)
        )
    loss_b = m_b["loss"]

    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_nan_free_training_with_interference_terms(feature_dir):
    preset = tiny_train_preset(num_epochs=1, alpha=0.01, beta=0.05, beta_voc=0.1, other_idx=1)
    trainer = Trainer(preset)
    losses = trainer.fit(_dataset(feature_dir, preset))
    assert np.isfinite(losses).all()


def test_tensorboard_metrics(feature_dir, tmp_path):
    pytest.importorskip("tensorflow")
    preset = tiny_train_preset(num_epochs=1)
    wd = str(tmp_path / "run")
    trainer = Trainer(preset, workdir=wd)
    trainer.fit(_dataset(feature_dir, preset), tensorboard=True)
    import os

    tb = os.path.join(wd, "tb")
    assert os.path.isdir(tb) and any(
        f.startswith("events") for f in os.listdir(tb)
    )


def test_fit_with_grain_loader(feature_dir):
    preset = tiny_train_preset(num_epochs=2)
    trainer = Trainer(preset)
    losses = trainer.fit(_dataset(feature_dir, preset), use_grain=True)
    assert len(losses) == 2 and np.isfinite(losses).all()


def test_validation_loss_logged(feature_dir, tmp_path):
    import json
    import os

    preset = tiny_train_preset(num_epochs=2)
    wd = str(tmp_path / "run")
    trainer = Trainer(preset, workdir=wd)
    ds = _dataset(feature_dir, preset)
    trainer.fit(ds, val_dataset=ds)
    records = [json.loads(l) for l in open(os.path.join(wd, "metrics.jsonl"))]
    vals = [r["val_loss"] for r in records if "val_loss" in r]
    assert len(vals) == 2 and np.isfinite(vals).all()
    # evaluate() standalone
    v = trainer.evaluate(ds, max_batches=2)
    assert np.isfinite(v)


def test_params_only_checkpointing(feature_dir, tmp_path):
    preset = tiny_train_preset(num_epochs=1, checkpoint_optimizer_state=False)
    wd = str(tmp_path / "run")
    t1 = Trainer(preset, workdir=wd)
    t1.fit(_dataset(feature_dir, preset))
    step1 = int(t1.state.step)
    t2 = Trainer(preset, workdir=wd)
    assert t2.restore() == step1
    for a, b in zip(jax.tree.leaves(t1.state.params), jax.tree.leaves(t2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer accumulators restarted
    assert all((np.asarray(x) == 0).all() for x in jax.tree.leaves(t2.state.opt_state))


def _record_batches(trainer):
    """Wrap trainer.train_step to record a checksum of every consumed batch."""
    seen = []
    orig = trainer.train_step

    def wrapped(state, x, y):
        seen.append(float(jnp.sum(x)))
        return orig(state, x, y)

    trainer.train_step = wrapped
    return seen


@pytest.mark.parametrize("use_grain", [False, True])
def test_mid_epoch_resume_sees_exactly_unseen_batches(feature_dir, tmp_path, use_grain):
    """Kill training mid-epoch; the resumed run consumes exactly the batches
    after the checkpoint — grain iterator state / deterministic batch index
    rides inside the orbax checkpoint (VERDICT r1 #5)."""
    preset = tiny_train_preset(num_epochs=2, checkpoint_every_steps=3)
    ds = _dataset(feature_dir, preset)
    n_batches = len(ds) // preset.train.batch_size
    assert n_batches >= 5, n_batches

    # uninterrupted reference run: record the full batch sequence
    ref = Trainer(preset)
    ref_seen = _record_batches(ref)
    ref.fit(ds, num_epochs=2, use_grain=use_grain)

    # interrupted run: stop mid-epoch-0 at step 4 (checkpoint at step 3)
    wd = str(tmp_path / f"run_{use_grain}")
    t1 = Trainer(preset, workdir=wd)
    t1_seen = _record_batches(t1)
    t1.fit(ds, num_epochs=2, use_grain=use_grain, max_steps=4)
    assert len(t1_seen) == 4

    # resume: must continue at batch index 4 of epoch 0 (ckpt at max_steps)
    t2 = Trainer(preset, workdir=wd)
    t2_seen = _record_batches(t2)
    step = t2.restore()
    assert step == 4
    t2.fit(ds, num_epochs=2, use_grain=use_grain)

    np.testing.assert_allclose(t1_seen + t2_seen, ref_seen, rtol=1e-6)
    # and the final params match the uninterrupted run's
    for a, b in zip(jax.tree.leaves(ref.state.params), jax.tree.leaves(t2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_resume_from_mid_epoch_checkpoint_not_max_steps(feature_dir, tmp_path):
    """Resume from a periodic (step-3) checkpoint: replay starts at batch 3."""
    preset = tiny_train_preset(num_epochs=1, checkpoint_every_steps=3)
    ds = _dataset(feature_dir, preset)
    ref = Trainer(preset)
    ref_seen = _record_batches(ref)
    ref.fit(ds, num_epochs=1)

    wd = str(tmp_path / "runp")
    t1 = Trainer(preset, workdir=wd)
    _record_batches(t1)
    t1.fit(ds, num_epochs=1, max_steps=3)  # stops exactly at the periodic save

    t2 = Trainer(preset, workdir=wd)
    t2_seen = _record_batches(t2)
    assert t2.restore() == 3
    t2.fit(ds, num_epochs=1)
    np.testing.assert_allclose(t2_seen, ref_seen[3:], rtol=1e-6)


def test_checkpoint_every_epochs_throttle(tmp_path):
    """checkpoint_every_epochs=K saves on every Kth epoch + the final one
    (per-epoch full-state saves can dominate runs on slow links)."""
    import dataclasses
    import os

    from convsep_tpu.train.loop import Trainer
    from convsep_tpu.data.pipeline import SegmentDataset
    from convsep_tpu.data.synth import synth_feature_dir

    preset = tiny_train_preset(num_epochs=5)
    preset = dataclasses.replace(
        preset,
        train=dataclasses.replace(
            preset.train, checkpoint_every_epochs=3, checkpoint_every_steps=10**9
        ),
    )
    d = tmp_path / "feats"
    synth_feature_dir(
        str(d), ("vocals", "accompaniment"), num_tracks=1, seconds=1.5,
        fs=8000, frame_size=256, hop_size=128,
    )
    ds = SegmentDataset(
        str(d), ("vocals", "accompaniment"),
        time_context=preset.train.time_context, overlap=preset.train.overlap,
        mult_factor_in=preset.train.mult_factor_in,
        mult_factor_out=preset.train.mult_factor_out,
    )
    wd = str(tmp_path / "run")
    tr = Trainer(preset, workdir=wd)
    tr.fit(ds)
    steps = sorted(
        int(s) for s in os.listdir(os.path.join(wd, "checkpoints")) if s.isdigit()
    )
    # epochs 3 (idx 2) and final epoch 5 → exactly 2 checkpoints
    assert len(steps) == 2, steps


def test_multi_step_dispatch_matches_single_steps(feature_dir):
    """K steps per dispatch (lax.scan, VERDICT r1 #3) == K single steps."""
    from convsep_tpu.train.loop import make_train_step_multi

    preset = tiny_train_preset(num_epochs=1)
    ds = _dataset(feature_dir, preset)
    batches = list(ds.batches(8, shuffle=True, seed=0))[:4]

    state_a, opt_a = create_train_state(preset, 0)
    step_a = make_train_step(preset, opt_a)
    la = []
    for x, y in batches:
        state_a, m = step_a(state_a, jnp.asarray(x), jnp.asarray(y))
        la.append(float(m["loss"]))

    state_b, opt_b = create_train_state(preset, 0)
    step_k = make_train_step_multi(preset, opt_b)
    xs = jnp.stack([jnp.asarray(x) for x, _ in batches])
    ys = jnp.stack([jnp.asarray(y) for _, y in batches])
    state_b, mk = step_k(state_b, xs, ys)
    np.testing.assert_allclose(np.asarray(mk["loss"]), la, rtol=1e-5)
    assert np.isfinite(np.asarray(mk["grad_norm"])).all()
    assert int(state_b.step) == int(state_a.step) == 4
    for a, b in zip(
        jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fit_steps_per_dispatch_and_observability(feature_dir, tmp_path):
    """Trainer with steps_per_dispatch>1 matches the per-step loop's loss
    trajectory and logs grad_norm / step_time_ms / rtf_train per record
    (SURVEY.md §5.5, VERDICT r1 #6)."""
    import json
    import os

    preset = tiny_train_preset(num_epochs=2, steps_per_dispatch=3, log_every_steps=2)
    wd = str(tmp_path / "run")
    trainer = Trainer(preset, workdir=wd)
    losses = trainer.fit(_dataset(feature_dir, preset))
    assert len(losses) == 2 and np.isfinite(losses).all()

    p1 = tiny_train_preset(num_epochs=2)
    losses1 = Trainer(p1).fit(_dataset(feature_dir, p1))
    # epoch 0 is fp-noise-identical; later epochs drift through adadelta's
    # accumulators (scan reassociation), so compare them loosely — the exact
    # K-steps == K-dispatches equality lives in
    # test_multi_step_dispatch_matches_single_steps
    np.testing.assert_allclose(losses[0], losses1[0], rtol=1e-5)
    np.testing.assert_allclose(losses, losses1, rtol=0.1)

    records = [json.loads(l) for l in open(os.path.join(wd, "metrics.jsonl"))]
    stepped = [r for r in records if "grad_norm" in r]
    assert stepped, "no per-step metric records were written"
    for r in stepped:
        assert np.isfinite(r["loss"]) and np.isfinite(r["grad_norm"])
        assert r["step_time_ms"] > 0 and r["rtf_train"] > 0
