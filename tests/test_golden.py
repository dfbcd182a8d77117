"""Golden end-to-end test (SURVEY.md §4 'Golden files').

A fixed model (PRNGKey(42)) separating a fixed synthetic mixture must keep
producing the committed stems — any change to DSP conventions, model math,
masking, or overlap-add shows up as a diff here. Regenerate deliberately
with tools/gen_golden.py if behavior changes on purpose.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from convsep_tpu.data import sine_mixture
from convsep_tpu.models import ConvSep
from convsep_tpu.separate import Separator
from tests.test_separate import tiny_preset

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "ikala_tiny_stems.npz")


def test_golden_separation_unchanged():
    preset = tiny_preset("ikala")
    cfg = preset.model
    params = ConvSep(cfg).init(
        jax.random.PRNGKey(42), jnp.zeros((1, cfg.time_context, cfg.feat_size, 1))
    )
    stems_true, mix = sine_mixture(2, 8000, fs=8000, freqs=(220.0, 1400.0), seed=11)
    golden = np.load(GOLDEN)
    np.testing.assert_allclose(mix, golden["mix"], atol=1e-7, err_msg="fixture drifted")
    out = Separator(preset, params)(mix)
    np.testing.assert_allclose(out, golden["stems"], atol=2e-4)
