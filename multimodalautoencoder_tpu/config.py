"""Configuration dataclasses for the TPU MMAE framework.

The reference passes hyperparameters as loose constructor kwargs
(``/root/reference/multimodal_autoencoder.py:59-70``).  Here they are frozen,
hashable dataclasses so a config can be a *static* argument to ``jax.jit`` and
a key in sweep ledgers.  Fields mirror the reference's knobs; deliberate
fixes of reference quirks (SURVEY.md §2.8) are opt-out via ``faithful_*``
flags so bug-compatible behavior remains available.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple

# The reference's hard-coded "intelligent noise" distribution: probability of
# each modality subset going missing together, measured on the study's real
# data (multimodal_autoencoder.py:200-206).
DEFAULT_NOISE_TYPE_PERCENTAGES: Tuple[float, ...] = (
    0.64018104, 0.03168217, 0.25119437, 0.07694242)
DEFAULT_NOISE_TYPES: Tuple[Tuple[str, ...], ...] = (
    (),
    ("call", "sms", "screen"),
    ("location",),
    ("location", "call", "sms", "screen"),
)

ACTIVATIONS = ("linear", "relu", "tanh", "softsign", "softplus")
LOSSES = ("mean_squared", "cross_entropy", "sigmoid_cross_entropy")
INITS = ("xavier", "normal")
NORMALIZATIONS = ("z_score", "between_0_and_1", None)


@dataclass(frozen=True)
class MMAEConfig:
    """Architecture + corruption + loss config for the multimodal autoencoder.

    Mirrors the reference ctor (multimodal_autoencoder.py:59-70).  The
    encoder is ``len(layer_sizes)`` dense layers (activation+dropout on all
    but the bottleneck); the decoder mirrors the sizes in reverse with
    activation+dropout on all but the output layer
    (multimodal_autoencoder.py:454-518).
    """

    num_feats: int = 0                       # input width (data-dependent)
    layer_sizes: Tuple[int, ...] = (128, 64, 32)
    variational: bool = False
    tie_weights: bool = True
    dropout_prob: float = 1.0                # KEEP probability, TF-style
    weight_penalty: float = 0.0
    activation: str = "softsign"
    loss: str = "sigmoid_cross_entropy"
    weight_initialization: str = "xavier"
    xavier_const: float = 1.0
    normalization: Optional[str] = "between_0_and_1"
    # TPU compute precision for matmuls: params/accumulation stay float32,
    # but with "bfloat16" the MXU operands are cast down (2x peak FLOPs).
    # No reference analog (TF1 graph is pure f32); parity tests use f32.
    compute_dtype: str = "float32"
    # Route dense layers through the Pallas fused matmul+bias+activation
    # kernel (ops/pallas_kernels.py).  Static-activation paths only (the
    # act_id lax.switch path keeps XLA matmuls).
    use_pallas: bool = False

    # Structured corruption (multimodal_autoencoder.py:668-702).
    intelligent_noise: bool = True
    num_modalities_to_drop: int = 1
    element_dropout_frac: float = 0.05       # fraction of features zeroed/row
    mask_with: float = -1.0
    fill_missing_with: float = 0.0
    noise_type_percentages: Tuple[float, ...] = DEFAULT_NOISE_TYPE_PERCENTAGES
    noise_types: Tuple[Tuple[str, ...], ...] = DEFAULT_NOISE_TYPES

    # Classification head (multimodal_autoencoder.py:313-338).
    classification_layer_sizes: Optional[Tuple[int, ...]] = None
    num_labels: int = 2
    classification_loss: str = "sigmoid_cross_entropy"
    classification_activation: Optional[str] = None  # defaults to `activation`
    classification_weight_penalty: float = 0.0

    # Quirk switches (SURVEY.md §2.8): the reference computes the VAE KL term
    # with the *sampled* z rather than mu (multimodal_autoencoder.py:402-405).
    # faithful_kl_on_z=True reproduces that; False uses the standard
    # KL(q(z|x) || N(0,1)) evaluated at mu.
    faithful_kl_on_z: bool = True
    # The reference's classify() gates activation/dropout on the number of
    # *decoder* layers instead of classification layers
    # (multimodal_autoencoder.py:533) — faithful by default.
    faithful_classify_gate: bool = True

    @property
    def embedding_size(self) -> int:
        return self.layer_sizes[-1]

    def validate(self) -> "MMAEConfig":
        """Apply the reference's constraint overrides and sanity checks.

        VAE mode forces untied weights, 0-1 normalization, and sigmoid-CE
        loss (multimodal_autoencoder.py:174-179); z-score normalization is
        incompatible with entropy losses (:181-184).
        """
        cfg = self
        if cfg.variational:
            cfg = dataclasses.replace(
                cfg, tie_weights=False, normalization="between_0_and_1",
                loss="sigmoid_cross_entropy")
        if cfg.normalization == "z_score" and "entropy" in cfg.loss:
            cfg = dataclasses.replace(cfg, normalization="between_0_and_1")
        if cfg.activation not in ACTIVATIONS:
            raise ValueError(f"unknown activation {cfg.activation!r}")
        if cfg.loss not in LOSSES:
            raise ValueError(f"unknown loss {cfg.loss!r}")
        if cfg.weight_initialization not in INITS:
            raise ValueError(f"unknown init {cfg.weight_initialization!r}")
        if cfg.compute_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"unknown compute_dtype {cfg.compute_dtype!r} "
                             "(float32 or bfloat16)")
        if cfg.variational and len(cfg.layer_sizes) < 2:
            raise ValueError("VAE needs >= 2 encoder layers (variance head "
                             "reads the second-to-last hidden layer)")
        if abs(sum(cfg.noise_type_percentages) - 1.0) > 1e-6:
            raise ValueError("noise_type_percentages must sum to 1")
        return cfg

    def replace(self, **kw) -> "MMAEConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class TrainConfig:
    """Optimization config (reference: ctor kwargs + train() args).

    The reference configures exponential LR decay and gradient clipping but
    both are inert due to bugs (SURVEY.md §2.8.1-2: global_step never
    incremented; clip_gradients never applied).  Here both *work*; set
    ``faithful_inert_decay=True`` / ``clip_gradients=False`` for
    bug-compatible behavior.
    """

    learning_rate: float = 1e-4
    batch_size: int = 10
    num_steps: int = 30000
    # 'adam' (reference default, multimodal_autoencoder.py:160) | 'sgd' |
    # 'adagrad' — the set the reference's ledger-restore path recognizes
    # (generic_wrapper.py:233-239).  Static: picks the jit trace.
    optimizer: str = "adam"
    decay: bool = True
    decay_steps: int = 1000
    decay_rate: float = 0.95
    decay_staircase: bool = False            # TF default: smooth decay
    clip_gradients: bool = True
    clip_norm: float = 5.0                   # NN baseline uses 5 (neural_net.py:190-195)
    record_every_nth: int = 50
    save_every_nth: int = 100000
    eval_batch_size: int = 200               # val batch in evaluate_performance (:719)
    faithful_inert_decay: bool = False       # reproduce reference bug 2.8.1
    # Adam moment-accumulator dtype.  'bfloat16' halves the optimizer's
    # HBM traffic — the measured bottleneck of config-parallel training
    # (Adam touches ~7x the parameter bytes per step, at the bandwidth
    # roofline on v5e).  'float32' for exact reference-style numerics.
    optimizer_state_dtype: str = "float32"
    seed: int = 0

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class ClassifierTrainConfig(TrainConfig):
    """Phase-2 (classification head) training defaults
    (multimodal_autoencoder.py:215-220)."""

    learning_rate: float = 1e-4
    batch_size: int = 100
