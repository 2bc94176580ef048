"""Parity tolerance-band harness for the BASELINE.md parity claim.

The reference's two scalar observables — the ones it optimizes and
reports itself — define "same numbers" (SURVEY.md §6):

1. noisy-val reconstruction loss, the grid-search objective
   (multimodal_autoencoder.py:1019-1033, used at
   autoencoder_wrapper.py:198);
2. per-modality masked-reconstruction RMSE, the paper's headline table
   (multimodal_autoencoder.py:1189-1216).

:func:`reference_recipe_observables` trains the reference recipe
(sigmoid-CE, lr 1e-3, 0-1 normalization, mask -1.0, decay(1000,.95),
batch 20, Adam — autoencoder_wrapper.py:79-92) on the deterministic
synthetic fixture set with N independent seeds and returns both
observables per seed.  Tests assert they land inside the stored band
(tests/fixtures/parity_band.json, provenance in PARITY.md): the CPU
suite pins the XLA backend; the hardware suite pins the Pallas training
kernel against the SAME band, which is the cross-backend
distributional-parity guarantee (RNG parity is distributional, never
bitwise — PARITY.md).
"""

from __future__ import annotations

import os
import tempfile
from typing import Dict, Optional, Sequence

import numpy as np

FIXTURE_SEED = 7
FIXTURE_ROWS = 400
# bump when synthetic.write_csv's generation recipe changes: the cached
# fixture file name is keyed on this, so stale files from older code
# versions are never silently reused
FIXTURE_VERSION = 1
RECIPE_STEPS = 500
RECIPE_ARCH = (16, 8)


def _fixture_loader():
    """Deterministic synthetic fixture set through the full DataLoader
    path (normalization/imputation included, so the observables cover the
    data pipeline too).  The cached CSV is version-keyed and written
    atomically (tmp + rename), so neither an old-recipe file nor a
    truncated interrupted write can be picked up."""
    from multimodalautoencoder_tpu.data import synthetic
    from multimodalautoencoder_tpu.data.loader import DataLoader

    path = os.path.join(
        tempfile.gettempdir(),
        f"parity_fixture_v{FIXTURE_VERSION}_{FIXTURE_SEED}"
        f"_{FIXTURE_ROWS}.csv")
    if not os.path.exists(path):
        fd, tmp = tempfile.mkstemp(suffix=".csv",
                                   dir=tempfile.gettempdir())
        os.close(fd)
        synthetic.write_csv(tmp, num_rows=FIXTURE_ROWS,
                            seed=FIXTURE_SEED)
        os.replace(tmp, path)
    return DataLoader(path, supervised=False, cross_validation=False,
                      suppress_output=True, normalize_and_fill=True,
                      normalization="between_0_and_1", fill_gaps_with=-1.0)


def reference_recipe_observables(backend: str = "xla",
                                 num_runs: int = 3,
                                 num_steps: int = RECIPE_STEPS,
                                 mesh=None,
                                 base_seed: int = 0) -> Dict[str, np.ndarray]:
    """Train the reference recipe ``num_runs`` times; return the two
    parity observables.

    Returns ``{"noisy_val_loss": (N,), "per_modality_rmse": (N, M)}``
    for N = num_runs.  The runs ride the grid trainer's config axis
    (identical hyperparameters); each row draws an independent RNG
    stream split from ``PRNGKey(base_seed * 7919 + 13)`` — the rows are
    independent repetitions, not individually-seeded runs.  One call is
    one jitted computation regardless of N.
    """
    import jax
    import jax.numpy as jnp

    from multimodalautoencoder_tpu.config import MMAEConfig, TrainConfig
    from multimodalautoencoder_tpu.models.corruption import NoiseSpec
    from multimodalautoencoder_tpu.parallel import grid_trainer as gt
    from multimodalautoencoder_tpu.parallel import mesh as mesh_lib
    from multimodalautoencoder_tpu.train import trainer

    dl = _fixture_loader()
    cfg = MMAEConfig(num_feats=dl.num_feats, layer_sizes=RECIPE_ARCH,
                     tie_weights=True, loss="sigmoid_cross_entropy",
                     normalization="between_0_and_1", mask_with=-1.0,
                     fill_missing_with=0.0,
                     weight_initialization="normal",
                     activation="softsign").validate()
    tcfg = TrainConfig(learning_rate=1e-3, batch_size=20,
                       num_steps=num_steps, decay=True, decay_steps=1000,
                       decay_rate=0.95, clip_gradients=False)
    spec = NoiseSpec.build(cfg, dl.modality_table)
    folded = gt.FoldedData.from_single_split(np.asarray(dl.train_X),
                                             np.asarray(dl.val_X))
    settings = [{"dropout_prob": 1.0, "weight_penalty": 0.0,
                 "activation_function": "softsign"}] * int(num_runs)
    hyper = gt.HyperStack.from_settings(settings, cfg, tcfg)
    if mesh is None:
        mesh = mesh_lib.make_mesh(devices=jax.devices()[:1], shape=(1, 1))

    # runs -> the config axis: train_grid splits an independent key per
    # config instance, so each row is an independent repetition
    params, losses = gt.train_grid_sharded(
        mesh, jax.random.PRNGKey(int(base_seed) * 7919 + 13), cfg, tcfg,
        spec, hyper, folded, backend=backend)

    masks = jnp.asarray(dl.modality_table.feature_masks())
    val_x = jnp.asarray(np.asarray(dl.val_X), jnp.float32)

    def rmse_one(p):
        return trainer.reconstruction_loss_per_modality(p, cfg, masks,
                                                        val_x)

    params_f0 = jax.tree_util.tree_map(lambda a: a[:, 0], params)
    rmse = jax.jit(jax.vmap(rmse_one))(params_f0)
    return {"noisy_val_loss": np.asarray(losses)[:, 0],
            "per_modality_rmse": np.asarray(rmse)}


def check_band(obs: Dict[str, np.ndarray], band: dict) -> list:
    """Return a list of violation strings (empty = all inside the band)."""
    problems = []
    lo, hi = band["noisy_val_loss"]
    for i, v in enumerate(obs["noisy_val_loss"]):
        if not (lo <= float(v) <= hi):
            problems.append(f"noisy_val_loss[seed {i}] = {v:.4f} "
                            f"outside [{lo:.4f}, {hi:.4f}]")
    for m, (mlo, mhi) in enumerate(band["per_modality_rmse"]):
        for i, v in enumerate(obs["per_modality_rmse"][:, m]):
            if not (mlo <= float(v) <= mhi):
                problems.append(
                    f"per_modality_rmse[seed {i}, modality {m}] = "
                    f"{v:.4f} outside [{mlo:.4f}, {mhi:.4f}]")
    return problems


def derive_band(observables: Dict[str, np.ndarray],
                rel_margin: float = 0.10,
                n_sigma: float = 6.0) -> dict:
    """Band = [min, max] widened by max(rel_margin * mean, n_sigma * std)
    per observable — generous enough for backend/hardware RNG variation,
    tight enough to catch objective regressions (a wrong loss term or a
    broken corruption path moves these observables more than 10%, and an
    untrained model's noisy-val loss already sits outside the band)."""
    def wide(vals):
        vals = np.asarray(vals, dtype=float)
        margin = max(rel_margin * abs(vals.mean()),
                     n_sigma * vals.std())
        return [float(vals.min() - margin), float(vals.max() + margin)]

    return {
        "noisy_val_loss": wide(observables["noisy_val_loss"]),
        "per_modality_rmse": [
            wide(observables["per_modality_rmse"][:, m])
            for m in range(observables["per_modality_rmse"].shape[1])],
    }
