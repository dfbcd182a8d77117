"""Config dataclasses + per-dataset presets.

Reference parity: the reference hard-codes all hyperparameters inside each
example script (SURVEY.md §5.6 [H]); these presets replicate those
constants as the single source of truth the tests pin against:

* iKala  — fs 44100, frameSize 1024, hopSize 512, 513 bins, T=30, 2 sources
* DSD100 — same transform, 4 sources (vocals/bass/drums/other)
* Bach10 — frameSize 4096 (high-res), 4 instruments, score-informed input
           channels (SURVEY.md §2.1 #10)
* highres4096 — the BASELINE.json config-#5 4096-pt multi-resolution run

Values are reconstructed ([M]/[L] per SURVEY provenance warning) and are
deliberately config, not code: converted reference checkpoints are the
shape oracle that corrects any wrong guess.
"""

from __future__ import annotations

import dataclasses

from convsep_tpu.models.convsep import ConvSepConfig


@dataclasses.dataclass(frozen=True)
class TransformConfig:
    """STFT analysis settings (reference Transforms/transformFFT [U])."""

    fs: int = 44100
    frame_size: int = 1024
    hop_size: int = 512
    nfft: int | None = None  # None → frame_size
    window: str = "sinebell"
    iscale: str = "lin"
    # "matmul": DFT as MXU matmuls (TPU speed path and the default — every
    # preset ships it; see dsp/dft.py) | "fft": jnp.fft (bit-exact parity
    # path for oracle tests, ~1e-4 abs of matmul) | "pallas": fused
    # framing/DFT/OLA/Wiener kernels (dsp/pallas — frames and masks never
    # materialize in HBM; bench-selectable vs matmul)
    fft_impl: str = "matmul"
    # Resynthesis (iSTFT) matmul-DFT precision — analysis always runs
    # "highest". "high" (default; bf16x3, ~2.4e-7 rel error — within the
    # ≤1e-5 operational fidelity target and below the 3e-5 PCM16
    # quantization step: measured ≤1 LSB / mean 0.008 LSB on int16 stems
    # vs "highest", at +14% headline RTF), "highest" (bf16x6, fp32-exact —
    # the bit-parity knob), "default" (bf16x1, ~3e-3 — too coarse for stem
    # output; kept for ablations).
    dft_precision: str = "high"
    # Masked-resynthesis routing for fft_impl="matmul" pipelines
    # (dsp/dft.py::istft_wiener): "auto" (default) = the fused Wiener+iSTFT
    # Mosaic mega-kernel on TPU for qualifying shapes, XLA mask·(re,im)
    # elsewhere; "ct_pallas_wiener" forces the kernel; "direct"/"factored"
    # force the XLA chain with that iDFT algorithm (the A/B lever).
    masked_synthesis: str = "auto"
    # Forward-analysis routing for fft_impl="matmul" pipelines: "auto"
    # (default) = the XLA factored chain — the fused forward-STFT Mosaic
    # kernel (dsp/pallas/ct_stft_kernel.py) measured SLOWER at b32
    # (8.09 vs 6.44 ms/track, decision record in resolve_analysis);
    # "ct_pallas" forces the kernel (exact, Nyquist-separate spectra
    # feeding the Wiener mega-kernel concat-free); "matmul" forces the
    # XLA chain. Analysis precision is "highest" on every route.
    analysis: str = "auto"
    # Multi-resolution analysis (BASELINE config #5): extra window sizes
    # whose magnitudes become additional input channels. They share
    # `hop_size` (so frame grids align exactly) and are frequency-
    # interpolated onto the main `bins` axis (dsp/multires.py).
    multires: tuple[int, ...] = ()

    @property
    def bins(self) -> int:
        return (self.nfft or self.frame_size) // 2 + 1


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training loop settings (reference train_auto [U])."""

    batch_size: int = 32
    num_epochs: int = 50
    optimizer: str = "adadelta"
    # "xla" = generic optax update (default — measured faster: XLA fuses
    # the adadelta accumulation into the dW GEMM epilogue); "fused" =
    # single-pass Pallas adadelta kernel (train/fused_optim.py, a pinned
    # decision record). Identical math; requires optimizer="adadelta".
    optimizer_impl: str = "xla"
    # Adadelta accumulator STORAGE dtype: "float32" (default — exact
    # reference math) or "bfloat16". Update arithmetic always runs in
    # float32; only the persisted accu/delta_accu slots narrow. The step
    # is HBM-bound streaming those slots over the 265 MB fc_expand leaf,
    # so bf16 state halves 4 of the step's HBM passes. Requires
    # optimizer="adadelta" + optimizer_impl="xla".
    optimizer_state_dtype: str = "float32"
    learning_rate: float = 1.0
    alpha: float = 0.001
    beta: float | None = None
    beta_voc: float | None = None
    vocals_idx: int = 0
    other_idx: int | None = None
    mult_factor_in: float = 0.3
    mult_factor_out: float = 0.3
    time_context: int = 30
    overlap: int = 20  # training segment overlap in frames
    # Train steps executed per device dispatch (lax.scan over K device-
    # resident batches, donated carry): amortizes the per-dispatch RPC
    # floor (~30 ms on tunneled rigs) over K steps. 1 = one jit call per
    # step (reference-shaped loop). Identical math either way.
    steps_per_dispatch: int = 1
    # Cadence (in steps) of per-step metric records: loss, grad_norm,
    # step_time_ms, rtf_train (SURVEY.md §5.5). Each record costs one
    # lagged device fetch (an RPC), so keep it ≫ 1 on tunneled rigs.
    log_every_steps: int = 50
    checkpoint_every_steps: int = 500
    # Per-epoch save cadence: every Nth epoch (plus always the final one).
    # On slow device→host links a full-state save moves hundreds of MB and
    # a per-epoch cadence can dominate (or wedge) the run — raise this for
    # big models on tunneled rigs.
    checkpoint_every_epochs: int = 1
    # False → checkpoint {step, params} only: 3× fewer bytes (adadelta keeps
    # two slots per param); resume restarts the optimizer accumulators
    checkpoint_optimizer_state: bool = True
    seed: int = 0
    # test-mode numerics tripwire (SURVEY.md §5.2): raise on NaN in any
    # jitted computation for the session
    debug_nans: bool = False


@dataclasses.dataclass(frozen=True)
class SepConfig:
    """Whole-track separation settings (reference separate_dsd.py [U])."""

    wiener_p: float = 1.0
    wiener_eps: float = 1e-8
    # pad segment counts up to the next multiple of this to bound the number
    # of distinct compiled shapes (SURVEY.md §7 hard-part #3)
    segment_bucket: int = 16
    # Score-gated resynthesis (score-informed presets only; SURVEY.md §3.4
    # "separation conditioned on the score masks at inference too"): each
    # source's magnitude estimate is multiplied by (1−g) + g·mask_i before
    # the Wiener normalization, where mask_i is recovered ON DEVICE from
    # the score-filtered extra channels (extra_i = mask_i·|mix|·mult ⇒
    # mask_i = extra_i / (|mix|·mult)). g=0 (default) = input-channel
    # conditioning only (the r3 behavior); g=1 = hard score gating of the
    # outputs. A quality lever for the bach10 oracle gap (VERDICT r3 #5).
    score_gate: float = 0.0
    # How score_gate combines the model estimate with the score prior:
    # "mult"  — est_i · ((1−g) + g·mask_i): gates the model's magnitudes,
    #           never discards them (the r4.0 behavior);
    # "blend" — (1−g)·est_i + g·mask_i·|mix|: a convex combination whose
    #           g=1 end IS score-mask-only separation. Measured on the
    #           pinned bach10 battery (2026-08-20): mask-only beats the
    #           trained model on sax/bassoon (5.5/7.6 vs 0.0/3.0 dB SDR),
    #           so blend dominates mult where the model is weakest.
    score_gate_mode: str = "mult"


@dataclasses.dataclass(frozen=True)
class Preset:
    name: str
    sources: tuple[str, ...]
    transform: TransformConfig
    model: ConvSepConfig
    train: TrainConfig
    sep: SepConfig


def _ikala() -> Preset:
    t = TransformConfig(fft_impl="matmul")
    return Preset(
        name="ikala",
        sources=("vocals", "accompaniment"),
        transform=t,
        model=ConvSepConfig(
            time_context=30, feat_size=t.bins, channels_in=1, num_sources=2
        ),
        train=TrainConfig(alpha=0.001, beta_voc=0.03, vocals_idx=0),
        sep=SepConfig(),
    )


def _dsd100() -> Preset:
    t = TransformConfig(fft_impl="matmul")
    return Preset(
        name="dsd100",
        sources=("vocals", "bass", "drums", "other"),
        transform=t,
        model=ConvSepConfig(
            time_context=30,
            feat_size=t.bins,
            channels_in=1,
            num_sources=4,
            conv1_freq_stride=3,  # strided vertical conv [M]
            # bf16 mask tail (see highres4096): dsd100 b32 4.39 -> 4.06
            # ms/track (+8%), stems 63.3 dB SNR / max 10 LSB vs the f32
            # tail (2026-08-20) - the headline preset rides it too
            mask_dtype="bfloat16",
        ),
        train=TrainConfig(alpha=0.001, beta=0.01, beta_voc=0.03, vocals_idx=0, other_idx=3),
        sep=SepConfig(),
    )


def _bach10() -> Preset:
    t = TransformConfig(frame_size=4096, hop_size=1024, fft_impl="matmul")
    n_instruments = 4  # violin, clarinet, saxophone, bassoon
    return Preset(
        name="bach10",
        sources=("violin", "clarinet", "saxophone", "bassoon"),
        transform=t,
        model=ConvSepConfig(
            time_context=30,
            feat_size=t.bins,
            channels_in=1 + n_instruments,  # mixture + score-filtered channels
            num_sources=n_instruments,
            conv1_freq_stride=3,
        ),
        train=TrainConfig(alpha=0.001),
        sep=SepConfig(),
    )


def _highres4096() -> Preset:
    t = TransformConfig(frame_size=4096, hop_size=1024, fft_impl="matmul")
    return Preset(
        name="highres4096",
        sources=("vocals", "bass", "drums", "other"),
        transform=t,
        model=ConvSepConfig(
            time_context=30,
            feat_size=t.bins,
            channels_in=1,
            num_sources=4,
            conv1_freq_stride=4,
            decoder_impl="auto",
            # bf16 mask tail: halves the decode-output family + the Wiener
            # kernel's y reads; the mask ratio still computes in f32
            # (ConvSepConfig.mask_dtype). Stem SNR vs the f32 tail measured
            # far above the separation error floor (BASELINE.md 2026-08-20)
            mask_dtype="bfloat16",
        ),
        train=TrainConfig(alpha=0.001, beta=0.01, beta_voc=0.03, vocals_idx=0, other_idx=3),
        sep=SepConfig(),
    )


def _multires4096() -> Preset:
    """BASELINE config #5: 4096-pt analysis with 1024/2048-pt magnitudes
    stacked as extra input channels (dsp/multires.py)."""
    t = TransformConfig(
        frame_size=4096, hop_size=1024, fft_impl="matmul", multires=(1024, 2048)
    )
    return Preset(
        name="multires4096",
        sources=("vocals", "bass", "drums", "other"),
        transform=t,
        model=ConvSepConfig(
            time_context=30,
            feat_size=t.bins,
            channels_in=1 + len(t.multires),
            num_sources=4,
            conv1_freq_stride=4,
            decoder_impl="auto",
            mask_dtype="bfloat16",  # see highres4096
        ),
        train=TrainConfig(alpha=0.001, beta=0.01, beta_voc=0.03, vocals_idx=0, other_idx=3),
        sep=SepConfig(),
    )


def stereo_preset(base: Preset) -> Preset:
    """Stereo-native joint-channel variant of a mono preset.

    Both channel magnitudes become model input channels and the tied
    decoder keeps per-channel estimates (`decoder_reduce="all"`), so one
    forward separates both ears jointly (separate/stereo.py; the reference
    was mono-only — ROADMAP r1 #4). Only plain single-channel presets can
    be lifted: score/multires presets already use the channel axis.
    """
    if base.model.channels_in != 1 or base.transform.multires:
        raise ValueError(f"preset {base.name!r} is not a plain mono preset")
    return dataclasses.replace(
        base,
        name=base.name + "-stereo",
        model=dataclasses.replace(base.model, channels_in=2, decoder_reduce="all"),
    )


PRESETS = {
    "ikala": _ikala,
    "dsd100": _dsd100,
    "bach10": _bach10,
    "highres4096": _highres4096,
    "multires4096": _multires4096,
    "ikala-stereo": lambda: stereo_preset(_ikala()),
    "dsd100-stereo": lambda: stereo_preset(_dsd100()),
    "highres4096-stereo": lambda: stereo_preset(_highres4096()),
}


def get_preset(name: str) -> Preset:
    try:
        return PRESETS[name]()
    except KeyError:
        raise ValueError(f"unknown preset {name!r}; have {sorted(PRESETS)}") from None
