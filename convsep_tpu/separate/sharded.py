"""Single-track separation sharded across the mesh (SURVEY.md §5.7).

For one very long track, the segments axis is sharded over the mesh's
`data` axis: each chip runs the CNN on its block of segments, masks its
block of frames, inverse-transforms locally, and the final overlap-add uses
`halo_overlap_add` — one `ppermute` carrying the (win−hop)-sample seam to
the right neighbor. Only the STFT (cheap, two matmuls) is replicated.

This is the conv/OLA analog of context parallelism: throughput scales with
chips for a single stream, complementing `separate/stream.py` which scales
across tracks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from convsep_tpu.configs.presets import Preset
from convsep_tpu.distributed.halo import halo_overlap_add
from convsep_tpu.dsp.dft import _inverse_mats, _key, stft_matmul
from convsep_tpu.dsp.istft import ola_norm
from convsep_tpu.dsp.stft import scale_magnitude
from convsep_tpu.dsp.windows import hann, sinebell
from convsep_tpu.models.convsep import ConvSep
from convsep_tpu.models.masks import wiener_mask
from convsep_tpu.separate.pipeline import bucket_length
from convsep_tpu.data.segment import segment_frames


def _window(preset: Preset) -> np.ndarray:
    return (sinebell if preset.transform.window == "sinebell" else hann)(
        preset.transform.frame_size
    )


@partial(jax.jit, static_argnames=("preset", "mesh", "length", "apply_fn"))
def separate_track_sharded(params, audio, preset: Preset, mesh, length: int, apply_fn=None):
    """(length,) mixture → (S, length) stems with the segment/frame axes
    sharded over `mesh`'s data axis. matmul fft_impl only.

    Requires the bucketed segment count to be divisible by the data axis
    (segment_bucket ≥ mesh size guarantees it). `preset`/`mesh`/`length`
    are static — one compile per (preset, mesh, bucketed length).
    """
    t, m, tr = preset.transform, preset.model, preset.train
    if t.fft_impl != "matmul":
        raise ValueError("sharded separation requires fft_impl='matmul'")
    n = mesh.shape["data"]
    win = _window(preset)
    hop = t.hop_size
    W = t.frame_size

    def run(params, audio):
        re, im = stft_matmul(audio, win, hop, t.nfft)  # replicated (cheap)
        nf = re.shape[0]
        mag = scale_magnitude(jnp.sqrt(re * re + im * im), t.iscale) * tr.mult_factor_in
        segs = segment_frames(mag, m.time_context)  # (nseg, T, F) zero-padded
        nseg = segs.shape[0]
        if nseg % n:  # reference framing adds +2 frames → one spill segment
            pad = n - nseg % n
            segs = jnp.pad(segs, ((0, pad), (0, 0), (0, 0)))
            nseg += pad
        x = jax.lax.with_sharding_constraint(
            segs[..., None], NamedSharding(mesh, P("data", None, None, None))
        )
        if apply_fn is None:
            # native source-major forward (no lane transpose)
            y = ConvSep(m).apply(params, x, method=ConvSep.sources)  # (nseg,S,T,F)
        else:
            y = apply_fn(params, x).transpose(0, 3, 1, 2)
        nf_pad = nseg * m.time_context
        y_frames = y.transpose(1, 0, 2, 3).reshape(-1, nf_pad, m.feat_size)  # (S, nf_pad, F)
        re_p = jnp.pad(re, ((0, nf_pad - nf), (0, 0)))
        im_p = jnp.pad(im, ((0, nf_pad - nf), (0, 0)))
        mask = wiener_mask(
            y_frames, p=preset.sep.wiener_p, eps=preset.sep.wiener_eps, axis=0
        )  # (S, nf_pad, bins)
        est_re = mask * re_p[None]
        est_im = mask * im_p[None]
        est_re = jax.lax.with_sharding_constraint(
            est_re, NamedSharding(mesh, P(None, "data", None))
        )
        from convsep_tpu.dsp.dft import _PRECISIONS

        inv_a, inv_b = _inverse_mats(t.nfft or W, W, _key(win))
        rp = _PRECISIONS[t.dft_precision]  # resynthesis precision knob
        frames = jnp.matmul(
            est_re, jnp.asarray(inv_a), preferred_element_type=jnp.float32, precision=rp
        )
        frames = frames + jnp.matmul(
            est_im, jnp.asarray(inv_b), preferred_element_type=jnp.float32, precision=rp
        )  # (S, nf_pad, W), synthesis window folded in
        data = halo_overlap_add(frames, hop, mesh, "data")  # (S, (nf_pad-1)*hop + W)
        norm = ola_norm(win.astype(np.float32), win.astype(np.float32), hop, nf_pad)
        data = data / jnp.asarray(norm)
        front = W // 2
        return data[:, front : front + length]

    return run(params, audio)




class ShardedSeparator:
    """Whole-track separator running one track across the entire mesh."""

    def __init__(self, preset: Preset, params, mesh, apply_fn=None):
        from convsep_tpu.distributed.mesh import replicated

        self.preset = preset
        self.mesh = mesh
        self.apply_fn = apply_fn
        self.params = jax.device_put(params, replicated(mesh))

    def __call__(self, audio: np.ndarray) -> np.ndarray:
        audio = np.asarray(audio, np.float32)
        if audio.ndim != 1:
            raise ValueError(f"expected mono audio, got {audio.shape}")
        L = len(audio)
        Lb = bucket_length(L, self.preset)
        padded = jnp.asarray(np.pad(audio, (0, Lb - L)))
        out = separate_track_sharded(
            self.params, padded, self.preset, self.mesh, Lb, self.apply_fn
        )
        return np.asarray(out)[:, :L]
