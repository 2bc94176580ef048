"""multimodalautoencoder_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with
the capabilities of natashamjaques/MultimodalAutoencoder.

The reference (ACII 2017 "Multimodal Autoencoder") is a single-device TF1
research codebase. This package is a ground-up redesign for TPU:

- pure-functional model core (``models/``): init/apply pytrees, jittable
  structured modality-dropout corruption, masked reconstruction losses;
- fused compute kernels (``ops/``): Pallas matmul+bias+activation chains and
  device-side metric batteries;
- scan-based trainers (``train/``): whole training runs inside one ``jit``
  with ``lax.scan``, orbax-style checkpointing;
- sweep engine (``sweep/``): hyperparameter grids executed as ``vmap`` over
  stacked parameter pytrees (config-parallel) instead of a serial loop;
- parallelism (``parallel/``): ``jax.sharding.Mesh`` + ``shard_map`` layouts
  for config x data/fold scale-out over ICI;
- data pipeline (``data/``): the reference CSV contracts (column triage,
  train-stat normalization, two-tier imputation, modality discovery from
  column-name prefixes, persisted CV folds) feeding device-resident arrays.
"""

__version__ = "0.1.0"

from multimodalautoencoder_tpu.config import MMAEConfig, TrainConfig
from multimodalautoencoder_tpu.models import mmae

__all__ = ["MMAEConfig", "TrainConfig", "mmae", "__version__"]
