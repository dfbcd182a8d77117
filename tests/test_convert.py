"""Checkpoint converter tests (SURVEY.md §7 hard-part #2).

The load-bearing test: a random reference-style param list pushed through
convert_reference_params + ConvSep.apply must equal the Theano-semantics
numpy oracle of build_ca — proving kernel flips, layout transposes,
flatten-order permutations, and tied InverseLayer semantics all line up.
"""

import os

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


def _repack(vals, cfg, *, merge=True, interleaved=True, chw=False):
    """Re-encode the canonical value list into a layout variant."""
    out = list(vals[:6])
    if chw:
        out[1] = out[1].reshape(-1, 1, 1)
        out[3] = out[3].reshape(-1, 1, 1)
    ws = vals[6 : 6 + 2 * cfg.num_sources : 2]
    bs = vals[7 : 7 + 2 * cfg.num_sources : 2]
    if interleaved:
        for w, b in zip(ws, bs):
            out.extend([w, b])
    else:
        out.extend(ws)
        out.extend(bs)
    if merge:
        out.append(vals[-1])
    return out


@pytest.mark.parametrize(
    "merge,interleaved,chw",
    [(True, True, False), (False, True, False), (True, False, False), (True, True, True)],
)
def test_detect_layout_variants(rng, merge, interleaved, chw):
    """Layout auto-detection: every plausible pickle packing converts to the
    SAME params as the canonical layout (VERDICT r1 #4)."""
    from convsep_tpu.ckpt.convert_reference import Layout, detect_layout

    vals = _random_reference_values(CFG, rng)
    packed = _repack(vals, CFG, merge=merge, interleaved=interleaved, chw=chw)
    layout = detect_layout(packed, CFG)
    assert layout.expand_interleaved == (interleaved or CFG.num_sources < 2) or interleaved
    got = convert_reference_params(packed, CFG, layout)
    want = convert_reference_params(vals, CFG)
    if not merge:  # merge bias defaults to zero when absent
        want["params"]["out_bias"] = np.zeros_like(want["params"]["out_bias"])
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the variant round-trips through export
    back = export_reference_params(got, CFG, layout)
    for a, b in zip(packed, back):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_detect_layout_on_file(tmp_path, rng):
    import pickle

    vals = _repack(_random_reference_values(CFG, rng), CFG, merge=False, interleaved=False)
    p = tmp_path / "variant.pkl"
    with open(p, "wb") as f:
        pickle.dump(vals, f, protocol=2)
    params = convert_reference_checkpoint(str(p), CFG)  # layout auto-detected
    assert params["params"]["conv1_kernel"].shape == (1, CFG.conv1_freq, 1, CFG.conv1_filters)


def test_detect_layout_no_fit_raises(rng):
    from convsep_tpu.ckpt.convert_reference import detect_layout

    vals = _random_reference_values(CFG, rng)
    vals[0] = vals[0][..., :-1]  # break conv1.W under every variant
    with pytest.raises(ValueError, match="no known reference layout"):
        detect_layout(vals, CFG)


def test_restricted_unpickler_blocks_code_objects(tmp_path):
    """The default loader must refuse pickles that reference arbitrary
    globals (pickle.load executes code — ADVICE r1 trust boundary)."""
    import pickle

    p = tmp_path / "evil.pkl"
    with open(p, "wb") as f:
        pickle.dump([np.zeros(3), os.path.join], f)  # function ref = code exec vector
    with pytest.raises(pickle.UnpicklingError, match="only plain"):
        load_reference_pickle(str(p))
    loaded = load_reference_pickle(str(p), allow_unsafe=True)
    assert len(loaded) == 2
