"""End-to-end training from raw audio: STFT inside the jitted train step.

SURVEY.md §1 "TPU-native restructuring implication": collapse the
reference's L1–L4 into one XLA program per step. The step consumes raw
audio segments (mixture (B, seg) + stems (B, S, seg)), runs the matmul-DFT
STFT for all of them on the MXU, scales magnitudes, applies the CNN +
Wiener mask, and takes the interference loss against the stem magnitudes —
forward, backward, and adadelta update in a single donated-buffer program.
No `.data` feature files, no host DSP.

Segment length must be `audio_dataset.segment_samples(preset)` so the
framing lands exactly on the model's time_context.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from convsep_tpu.configs.presets import Preset
from convsep_tpu.data.audio_dataset import segment_samples
from convsep_tpu.dsp.dft import stft_matmul
from convsep_tpu.dsp.stft import scale_magnitude
from convsep_tpu.dsp.windows import hann, sinebell
from convsep_tpu.models.convsep import ConvSep, trainable_config
from convsep_tpu.models.masks import wiener_filter
from convsep_tpu.train.losses import interference_matrix, separation_loss
from convsep_tpu.train.loop import TrainState


def make_audio_loss_fn(preset: Preset) -> Callable:
    """(params, mix (B, seg), stems (B, S, seg)) → loss; STFT on device."""
    t, m, tr = preset.transform, trainable_config(preset.model), preset.train
    win = (sinebell if t.window == "sinebell" else hann)(t.frame_size)
    seg = segment_samples(preset)
    model = ConvSep(m)
    interf = interference_matrix(
        m.num_sources,
        alpha=tr.alpha,
        beta=tr.beta,
        beta_voc=tr.beta_voc,
        vocals_idx=tr.vocals_idx,
        other_idx=tr.other_idx,
    )

    def mag_of(audio):  # (..., seg) → (..., T, F) scaled magnitude
        if t.fft_impl == "pallas":
            from convsep_tpu.dsp.pallas import stft_pallas

            re, im = stft_pallas(audio, win, t.hop_size, t.nfft)
        else:
            re, im = stft_matmul(audio, win, t.hop_size, t.nfft)
        return scale_magnitude(jnp.sqrt(re * re + im * im), t.iscale)

    def extra_of(mix):  # (B, seg) → (B, T, F, n_res) multires channels
        # same definition as the feature files (data/features.py) and the
        # fused separation path: per-resolution magnitude on the shared
        # hop grid, interpolated onto the main bin axis (dsp/multires.py)
        from convsep_tpu.dsp.multires import _window as _mr_window, freq_interp_matrix

        chans = []
        for size in t.multires:
            win2 = _mr_window(t.window, size)
            re2, im2 = stft_matmul(mix, win2, t.hop_size, size)
            mag2 = jnp.sqrt(re2 * re2 + im2 * im2)
            interp = jnp.asarray(freq_interp_matrix(size // 2 + 1, t.bins))
            chans.append(
                jnp.matmul(mag2, interp, preferred_element_type=jnp.float32)
            )
        return scale_magnitude(jnp.stack(chans, axis=-1), t.iscale) * tr.mult_factor_in

    def stereo_loss_fn(params, mix, stems):
        # stereo-native joint model: mix (B, 2, seg), stems (B, S, 2, seg)
        B = mix.shape[0]
        if mix.shape[-1] != seg:
            raise ValueError(f"segment length {mix.shape[-1]} != required {seg}")
        x = mag_of(mix) * tr.mult_factor_in  # (B, 2, T, F)
        x = x.transpose(0, 2, 3, 1)  # (B, T, F, 2)
        y_t = (
            mag_of(stems.reshape(-1, seg)).reshape(
                B, m.num_sources, 2, m.time_context, m.feat_size
            )
            * tr.mult_factor_out
        ).transpose(0, 1, 3, 4, 2)  # (B, S, T, F, 2)
        out = model.apply(params, x, method=ConvSep.sources)  # (B, S, T, F, 2)
        est = wiener_filter(out, x, eps=preset.sep.wiener_eps, axis=1)
        return separation_loss(est, y_t, interf, source_axis=1)

    if m.decoder_reduce == "all":
        return stereo_loss_fn

    def loss_fn(params, mix, stems):
        B = mix.shape[0]
        if mix.shape[-1] != seg:
            raise ValueError(f"segment length {mix.shape[-1]} != required {seg}")
        x = mag_of(mix) * tr.mult_factor_in  # (B, T, F)
        # stem magnitudes land in source-major (B, S, T, F) NATURALLY — the
        # model's native output layout, so the whole step is transpose-free
        y_t = (
            mag_of(stems.reshape(-1, seg)).reshape(B, -1, m.time_context, m.feat_size)
            * tr.mult_factor_out
        )
        xc = x[..., None]
        if t.multires:  # multi-res conditioning computed in-step from mix
            xc = jnp.concatenate([xc, extra_of(mix)], axis=-1)
        out = model.apply(params, xc, method=ConvSep.sources)
        est = wiener_filter(out, x, eps=preset.sep.wiener_eps, axis=1)
        return separation_loss(est, y_t, interf, source_axis=1)

    return loss_fn


def make_audio_train_step(
    preset: Preset, opt: optax.GradientTransformation
) -> Callable[[TrainState, jnp.ndarray, jnp.ndarray], tuple[TrainState, dict]]:
    """(state, mix (B, seg), stems (B, S, seg)) → (state, metrics), one
    program (STFT + forward + backward + update)."""
    from convsep_tpu.train.loop import _preset_apply_fn, step_from_loss

    return step_from_loss(make_audio_loss_fn(preset), opt, _preset_apply_fn(preset))


def make_audio_train_step_multi(
    preset: Preset, opt: optax.GradientTransformation
) -> Callable[[TrainState, jnp.ndarray, jnp.ndarray], tuple[TrainState, dict]]:
    """K-steps-per-dispatch variant: (state, mix (K,B,seg), stems
    (K,B,S,seg)) → (state, {"loss": (K,), "grad_norm": (K,)})."""
    from convsep_tpu.train.loop import _preset_apply_fn, multi_step_from_loss

    return multi_step_from_loss(
        make_audio_loss_fn(preset), opt, _preset_apply_fn(preset)
    )
