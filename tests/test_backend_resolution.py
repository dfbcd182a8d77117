"""Device-aware "auto" resolution (VERDICT r4 #7 / ADVICE r3).

The `decoder_impl="auto"` / `masked_synthesis="auto"` envelopes must
resolve against the device the computation targets — not the
process-global ``jax.default_backend()`` read at trace time. These tests
simulate the failure case (a jit targeting a non-default backend) by
monkeypatching the process default to "tpu" while the ``default_device``
context / concrete arrays say CPU.
"""

import jax
import jax.numpy as jnp
import pytest

from convsep_tpu.configs.presets import get_preset
from convsep_tpu.dsp.dft import resolve_masked_synthesis
from convsep_tpu.models.convsep import resolve_decoder_impl
from convsep_tpu.utils.backend import effective_backend


def test_effective_backend_default_matches_process():
    assert effective_backend() == jax.default_backend() == "cpu"


def test_effective_backend_honors_default_device_context(monkeypatch):
    # pretend the process default is TPU; the default_device context must win
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert effective_backend() == "tpu"
    with jax.default_device(jax.devices("cpu")[0]):
        assert effective_backend() == "cpu"
    assert effective_backend() == "tpu"


def test_effective_backend_honors_concrete_array_device(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    x = jnp.zeros(4)  # committed to a CPU device in this suite
    assert effective_backend(x) == "cpu"


def test_effective_backend_tracer_falls_through(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    seen = []

    def f(x):
        seen.append(effective_backend(x))
        return x

    with jax.default_device(jax.devices("cpu")[0]):
        jax.jit(f)(jnp.zeros(4))
    # tracer has no committed device -> the default_device context decides
    assert seen == ["cpu"]


def test_decoder_auto_resolution_is_device_aware(monkeypatch):
    cfg = get_preset("highres4096").model
    assert cfg.decoder_impl == "auto"
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # process default says tpu -> Mosaic branch
    assert resolve_decoder_impl(cfg) == "bandconv_pallas"
    # ... but a CPU-targeted jit must NOT bake in the Mosaic kernel
    with jax.default_device(jax.devices("cpu")[0]):
        assert resolve_decoder_impl(cfg) == "bandconv"


def test_masked_synthesis_resolution_is_device_aware(monkeypatch):
    t = get_preset("highres4096").transform
    nfft = t.nfft or t.frame_size
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert (
        resolve_masked_synthesis(t.masked_synthesis, nfft, t.frame_size, t.hop_size)
        == "ct_pallas_wiener"
    )
    with jax.default_device(jax.devices("cpu")[0]):
        resolved = resolve_masked_synthesis(
            t.masked_synthesis, nfft, t.frame_size, t.hop_size
        )
    # on CPU the fallback must name the CONCRETE XLA algorithm (ADVICE r4),
    # and 4096-pt resolves to the factored chain
    assert resolved == "factored"


def test_masked_synthesis_resolution_never_returns_auto():
    for name in ("ikala", "dsd100", "bach10", "highres4096", "multires4096"):
        t = get_preset(name).transform
        nfft = t.nfft or t.frame_size
        resolved = resolve_masked_synthesis(
            t.masked_synthesis, nfft, t.frame_size, t.hop_size
        )
        assert resolved != "auto", name


def test_checkpoint_save_rejects_prepared_pytrees(tmp_path):
    from convsep_tpu.ckpt.orbax_io import CheckpointManager, _has_prepared_leaves

    prepared = {"params": {"fc_expand": {"bias": jnp.zeros(3)}},
                "dec_cache": {"fc_expand": {"k4": jnp.zeros((2, 2))}}}
    assert _has_prepared_leaves(prepared)
    assert not _has_prepared_leaves({"params": {"w": jnp.zeros(3)}})
    mgr = CheckpointManager(str(tmp_path / "ck"), async_save=False)
    with pytest.raises(ValueError, match="prepared"):
        mgr.save(0, prepared)
    mgr.close()
