"""Checkpoint converter tests (SURVEY.md §7 hard-part #2).

The load-bearing test: a random reference-style param list pushed through
convert_reference_params + ConvSep.apply must equal the Theano-semantics
numpy oracle of build_ca — proving kernel flips, layout transposes,
flatten-order permutations, and tied InverseLayer semantics all line up.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from convsep_tpu.models import ConvSep, ConvSepConfig
from convsep_tpu.ckpt import (
    convert_reference_params,
    export_reference_params,
    load_reference_pickle,
)
from convsep_tpu.ckpt.convert_reference import convert_reference_checkpoint
from tests.oracle_reference_net import reference_forward_np

CFG = ConvSepConfig(
    time_context=12,
    feat_size=33,
    channels_in=1,
    num_sources=2,
    conv1_filters=3,
    conv1_freq=5,
    conv1_freq_stride=1,
    conv2_filters=4,
    conv2_time=6,
    bottleneck=8,
)


def _random_reference_values(cfg: ConvSepConfig, rng) -> list[np.ndarray]:
    def r(*shape):
        return (0.3 * rng.standard_normal(shape)).astype(np.float32)

    vals = [
        r(cfg.conv1_filters, cfg.channels_in, 1, cfg.conv1_freq),
        r(cfg.conv1_filters),
        r(cfg.conv2_filters, cfg.conv1_filters, cfg.conv2_time_eff, 1),
        r(cfg.conv2_filters),
        r(cfg.enc_flat, cfg.bottleneck),
        r(cfg.bottleneck),
    ]
    for _ in range(cfg.num_sources):
        vals.append(r(cfg.bottleneck, cfg.enc_flat))
        vals.append(r(cfg.enc_flat))
    vals.append(r(cfg.num_sources))
    return vals


@pytest.mark.parametrize("stride", [1, 2])
def test_converted_params_match_theano_oracle(rng, stride):
    import dataclasses

    cfg = dataclasses.replace(CFG, conv1_freq_stride=stride)
    vals = _random_reference_values(cfg, rng)
    params = convert_reference_params(vals, cfg)
    x_nchw = (0.5 * np.abs(rng.standard_normal((2, 1, cfg.time_context, cfg.feat_size)))).astype(
        np.float32
    )
    want = reference_forward_np(vals, x_nchw.astype(np.float64), conv1_stride=stride)
    x_nhwc = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
    got = np.asarray(ConvSep(cfg).apply(jax.tree.map(jnp.asarray, params), x_nhwc))
    got_nchw = got.transpose(0, 3, 1, 2)  # (B,S,T,F)
    np.testing.assert_allclose(got_nchw, want, atol=2e-4)


def test_export_roundtrip(rng):
    vals = _random_reference_values(CFG, rng)
    params = convert_reference_params(vals, CFG)
    back = export_reference_params(params, CFG)
    assert len(back) == len(vals)
    for a, b in zip(vals, back):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_pickle_loading_and_full_file_conversion(tmp_path, rng):
    import pickle

    vals = _random_reference_values(CFG, rng)
    p = tmp_path / "model.pkl"
    with open(p, "wb") as f:
        pickle.dump(vals, f, protocol=2)  # reference used py2-era pickles
    loaded = load_reference_pickle(str(p))
    params = convert_reference_checkpoint(str(p), CFG)
    assert params["params"]["conv1_kernel"].shape == (1, CFG.conv1_freq, 1, CFG.conv1_filters)
    for a, b in zip(vals, loaded):
        np.testing.assert_array_equal(a, b)


def test_wrong_count_and_shape_errors(rng):
    vals = _random_reference_values(CFG, rng)
    with pytest.raises(ValueError, match="expected 11"):
        convert_reference_params(vals[:-2], CFG)
    bad = list(vals)
    bad[0] = bad[0][:, :, :, :-1]
    with pytest.raises(ValueError, match="conv1.W"):
        convert_reference_params(bad, CFG)


def test_converted_params_load_into_model_init_structure(rng):
    """Converted tree matches ConvSep.init's structure exactly."""
    vals = _random_reference_values(CFG, rng)
    params = convert_reference_params(vals, CFG)
    ref = ConvSep(CFG).init(
        jax.random.PRNGKey(0), jnp.zeros((1, CFG.time_context, CFG.feat_size, 1))
    )
    ref_shapes = jax.tree.map(lambda a: a.shape, ref)
    got_shapes = jax.tree.map(lambda a: a.shape, params)
    assert ref_shapes == got_shapes
