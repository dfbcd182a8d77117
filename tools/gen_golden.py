import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
import sys
sys.path.insert(0, "/root/repo")
from tests.test_separate import tiny_preset
from convsep_tpu.data import sine_mixture
from convsep_tpu.models import ConvSep
from convsep_tpu.separate import Separator

preset = tiny_preset("ikala")
cfg = preset.model
params = ConvSep(cfg).init(jax.random.PRNGKey(42), jnp.zeros((1, cfg.time_context, cfg.feat_size, 1)))
stems_true, mix = sine_mixture(2, 8000, fs=8000, freqs=(220.0, 1400.0), seed=11)
out = Separator(preset, params)(mix)
np.savez_compressed("/root/repo/tests/golden/ikala_tiny_stems.npz", stems=out, mix=mix)
print("golden written", out.shape, out.dtype, float(np.abs(out).mean()))
