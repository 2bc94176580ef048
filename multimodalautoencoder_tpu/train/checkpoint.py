"""Checkpoint/resume with a hyperparameter side-car.

Mirrors the reference contract (multimodal_autoencoder.py:766-896): a
checkpoint stores the trained weights plus an ``.npz``-style side-car with
the loss curves and 7 hyperparameters; loading diffs saved-vs-current
hyperparameters, warns, and overrides with the saved values (the saved model
wins, since the weights were trained under those settings).

Storage is a single ``.npz`` holding the flattened parameter pytree (leaf
order from ``jax.tree_util.tree_flatten``) plus a JSON metadata blob —
host-portable, no TF Saver.  Checkpoint names carry the trained-step count
like the reference (``<name>-<steps>``, :787-791).

The reference's ``tf.train.Saver`` covers ALL graph variables — Adam slot
variables included — so a restored model resumes training step-exactly
(:786-788, :855-859).  The equivalent here is the ``states`` payload:
arbitrary named pytrees (optimizer slots, step counter, RNG key) flattened
alongside the params and restored with :func:`restore_state`.  bfloat16
leaves are stored as uint16 views (npz cannot round-trip ml_dtypes) and
viewed back on load.
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodalautoencoder_tpu.config import MMAEConfig, TrainConfig

# The 7 hyperparameters the reference persists (:792-801).
SIDECAR_FIELDS = ("layer_sizes", "variational", "dropout_prob",
                  "weight_penalty", "activation", "loss",
                  "weight_initialization")
# reference name -> our config field
_REF_ALIASES = {"activation_func": "activation", "loss_func": "loss"}


def save_checkpoint(directory: str, model_name: str, params,
                    cfg: MMAEConfig, curves: Optional[dict] = None,
                    step: Optional[int] = None,
                    tcfg: Optional[TrainConfig] = None,
                    states: Optional[dict] = None,
                    state_tags: Optional[dict] = None,
                    extra: Optional[dict] = None) -> str:
    """Save params + hyperparam/curve side-car.  Returns the file path.

    ``step`` defaults to ``len(train_loss) * record_every_nth``, matching
    the reference's "training_epochs" naming (:787-788).

    ``states`` maps a name to an arbitrary pytree persisted alongside the
    params — the analog of the reference Saver covering optimizer slot
    variables (:786-788).  ``state_tags`` optionally attaches a string per
    state (e.g. the optimizer name) that :func:`restore_state` can check.

    ``extra`` is an arbitrary JSON-serializable dict stored under
    ``meta["extra"]`` (e.g. the sweep setting a best-params export
    corresponds to); read it back with :func:`checkpoint_meta`.
    """
    os.makedirs(directory, exist_ok=True)
    curves = curves or {}
    states = states or {}
    state_tags = state_tags or {}
    if step is None:
        record = tcfg.record_every_nth if tcfg else 50
        step = len(np.asarray(curves.get("train_loss", []))) * record

    leaves, treedef = jax.tree_util.tree_flatten(params)
    payload = {f"param_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    for name, arr in curves.items():
        payload[f"curve_{name}"] = np.asarray(arr)

    states_meta = {}
    for name, tree in states.items():
        s_leaves = jax.tree_util.tree_leaves(tree)
        bf16 = []
        for i, leaf in enumerate(s_leaves):
            a = np.asarray(leaf)
            if a.dtype == jnp.bfloat16:
                a = a.view(np.uint16)
                bf16.append(i)
            payload[f"state_{name}_{i}"] = a
        states_meta[name] = {"num_leaves": len(s_leaves), "bf16": bf16,
                             "tag": state_tags.get(name)}

    meta = {
        "num_leaves": len(leaves),
        "treedef": str(treedef),
        "step": int(step),
        "config": {f.name: getattr(cfg, f.name)
                   for f in dataclasses.fields(cfg)},
        "curve_names": sorted(curves.keys()),
        "states": states_meta,
    }
    if extra is not None:
        meta["extra"] = extra
    payload["meta_json"] = np.frombuffer(
        json.dumps(meta, default=_json_default).encode(), dtype=np.uint8)

    path = os.path.join(directory, f"{model_name}-{step}.npz")
    np.savez(path, **payload)
    return path


def _json_default(o):
    if isinstance(o, (tuple, set)):
        return list(o)
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    raise TypeError(f"not JSON serializable: {type(o)}")


def latest_checkpoint(directory: str,
                      model_name: Optional[str] = None) -> Optional[str]:
    """Highest-step checkpoint in ``directory`` — the analog of
    ``tf.train.latest_checkpoint`` (:823)."""
    if not os.path.isdir(directory):
        return None
    pat = re.compile(r"^(.*)-(\d+)\.npz$")
    best, best_step = None, -1
    for fn in os.listdir(directory):
        m = pat.match(fn)
        if not m:
            continue
        if model_name is not None and m.group(1) != model_name:
            continue
        if int(m.group(2)) > best_step:
            best, best_step = fn, int(m.group(2))
    return os.path.join(directory, best) if best else None


class CheckpointReader:
    """One-open view of a checkpoint: the npz directory and the JSON
    metadata parse ONCE, then params / curves / states load from the
    same handle (members decompress lazily, so a reader that only
    touches the meta never reads the weights).  The full restore path —
    params + curves + up to two optimizer states
    (``api.load_saved_model``, the analog of the reference's one
    ``saver.restore`` over all variables,
    multimodal_autoencoder.py:843-859) — costs one file open through
    this instead of five.  Use as a context manager."""

    def __init__(self, path: str):
        self.path = path
        self._data = np.load(path)
        self.meta = json.loads(bytes(self._data["meta_json"]).decode())

    def close(self) -> None:
        self._data.close()

    def __enter__(self) -> "CheckpointReader":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    @property
    def step(self) -> int:
        return self.meta["step"]

    def state_names(self) -> tuple:
        return tuple(sorted(self.meta.get("states", {})))

    def curves(self) -> dict:
        return {name: self._data[f"curve_{name}"]
                for name in self.meta.get("curve_names", [])}

    def sidecar_resolved(self, cfg: MMAEConfig,
                         verbose: bool = True) -> MMAEConfig:
        """Diff the persisted SIDECAR_FIELDS against ``cfg``, warn, and
        override with the saved values (the saved model wins — the
        weights were trained under those settings, :840-853)."""
        saved_cfg_dict = self.meta["config"]
        resolved = cfg
        for name in SIDECAR_FIELDS:
            saved = saved_cfg_dict.get(name)
            if isinstance(saved, list):
                saved = tuple(tuple(s) if isinstance(s, list) else s
                              for s in saved)
            current = getattr(cfg, name)
            if saved is not None and saved != current:
                if verbose:
                    print(f"WARNING! Saved setting for {name} is "
                          f"different! current={current!r} saved={saved!r}; "
                          f"overwriting with saved value.")
                resolved = resolved.replace(**{name: saved})
        return resolved

    def full_resolved(self, cfg: MMAEConfig) -> MMAEConfig:
        """``cfg`` overridden by EVERY persisted config field — the
        template-rebuild config (the reference rebuilds its whole graph
        from the saved hyperparameters, :855-859)."""
        saved = dict(self.meta["config"])
        for k, v in list(saved.items()):
            if isinstance(v, list):
                saved[k] = tuple(tuple(x) if isinstance(x, list) else x
                                 for x in v)
        return dataclasses.replace(cfg, **{
            k: v for k, v in saved.items()
            if k in {f.name for f in dataclasses.fields(cfg)}}).validate()

    def params(self, template_params):
        """The stored parameter pytree in ``template_params``' structure."""
        leaves = [self._data[f"param_{i}"]
                  for i in range(self.meta["num_leaves"])]
        treedef = jax.tree_util.tree_structure(template_params)
        if treedef.num_leaves != len(leaves):
            raise ValueError(
                f"checkpoint has {len(leaves)} leaves but template has "
                f"{treedef.num_leaves}; rebuild the template with the "
                f"resolved config")
        return jax.tree_util.tree_unflatten(treedef, leaves)

    def load(self, template_params, cfg: MMAEConfig, verbose: bool = True
             ) -> Tuple[object, MMAEConfig, dict, int]:
        """(params, resolved_cfg, curves, step) — :func:`load_checkpoint`
        against this reader's open handle."""
        resolved = self.sidecar_resolved(cfg, verbose=verbose)
        return self.params(template_params), resolved, self.curves(), \
            self.step

    def load_auto(self, cfg: MMAEConfig, verbose: bool = True):
        """:func:`load_checkpoint_auto` against this reader's open
        handle: rebuild the parameter template from the saved
        hyperparameters, then load."""
        from multimodalautoencoder_tpu.models import mmae

        resolved = self.full_resolved(cfg)
        template = mmae.init(jax.random.PRNGKey(0), resolved)
        return self.load(template, resolved, verbose=verbose)

    def restore_state(self, name: str, template,
                      expect_tag: Optional[str] = None):
        """:func:`restore_state` against this reader's open handle."""
        info = self.meta.get("states", {}).get(name)
        if info is None:
            return None
        if expect_tag is not None and info.get("tag") not in (None,
                                                              expect_tag):
            raise ValueError(
                f"checkpoint state {name!r} was saved under tag "
                f"{info.get('tag')!r} but {expect_tag!r} was expected")
        bf16 = set(info.get("bf16", []))
        leaves = []
        for i in range(info["num_leaves"]):
            a = self._data[f"state_{name}_{i}"]
            if i in bf16:
                a = a.view(jnp.bfloat16)
            leaves.append(a)

        treedef = jax.tree_util.tree_structure(template)
        if treedef.num_leaves != len(leaves):
            raise ValueError(
                f"checkpoint state {name!r} has {len(leaves)} leaves but "
                f"the template has {treedef.num_leaves} — optimizer or "
                "model structure differs; fall back to fresh state")
        for a, t in zip(leaves, jax.tree_util.tree_leaves(template)):
            tshape = t.shape if hasattr(t, "shape") else np.shape(t)
            if tuple(np.shape(a)) != tuple(tshape):
                raise ValueError(
                    f"checkpoint state {name!r} leaf shape {np.shape(a)} "
                    f"!= template {tuple(tshape)} — fall back to fresh "
                    "state")
            # Dtype must match too: a checkpoint saved under a different
            # optimizer_state_dtype (e.g. bf16 moments) restored into an
            # f32-configured run would silently resume with
            # wrong-precision Adam accumulators.
            tdtype = getattr(t, "dtype", None)
            if tdtype is not None and np.dtype(a.dtype) != np.dtype(tdtype):
                raise ValueError(
                    f"checkpoint state {name!r} leaf dtype {a.dtype} != "
                    f"template {tdtype} (optimizer_state_dtype differs?) "
                    "— fall back to fresh state")
        return jax.tree_util.tree_unflatten(treedef, leaves)


def load_checkpoint(path: str, template_params, cfg: MMAEConfig,
                    verbose: bool = True
                    ) -> Tuple[object, MMAEConfig, dict, int]:
    """Load (params, resolved_cfg, curves, step) from a checkpoint.

    Like the reference (:840-853), any persisted hyperparameter that differs
    from ``cfg`` is reported and the *saved* value wins, so the returned
    config matches the stored weights.  ``template_params`` supplies the
    pytree structure (build via ``mmae.init`` with the returned config if
    structure differs — see :func:`load_checkpoint_auto`).
    """
    with CheckpointReader(path) as r:
        return r.load(template_params, cfg, verbose=verbose)


def load_checkpoint_auto(path: str, cfg: MMAEConfig, verbose: bool = True):
    """Load a checkpoint, rebuilding the parameter template from the
    *saved* hyperparameters (the reference rebuilds its whole graph from
    them, :855-859)."""
    with CheckpointReader(path) as r:
        return r.load_auto(cfg, verbose=verbose)


def checkpoint_meta(path: str) -> dict:
    """The checkpoint's JSON metadata blob (config, step, curve/state
    names, and any ``extra`` dict passed at save time) — the analog of
    reading the reference's ``.npz`` side-car without restoring weights
    (multimodal_autoencoder.py:833-839)."""
    with CheckpointReader(path) as r:
        return r.meta


def saved_state_names(path: str) -> tuple:
    """Names of the auxiliary state pytrees stored in a checkpoint — the
    analog of listing the reference Saver's covered slot variables
    (multimodal_autoencoder.py:786-788)."""
    return tuple(sorted(checkpoint_meta(path).get("states", {})))


def restore_state(path: str, name: str, template,
                  expect_tag: Optional[str] = None):
    """Restore the named auxiliary state pytree from a checkpoint.

    The equivalent of ``saver.restore`` covering optimizer slot variables
    (multimodal_autoencoder.py:855-859): ``template`` supplies the pytree
    structure (build via ``optim.opt_init`` around the loaded params, or
    abstractly via ``jax.eval_shape`` — leaves only need a ``.shape``);
    leaves come back with their SAVED dtypes/values, bit-exactly.

    Returns ``None`` when the checkpoint has no state under ``name``
    (e.g. written by an older save).  Raises ``ValueError`` on structure,
    shape, or tag mismatch — callers should fall back to fresh
    initialization in that case.
    """
    with CheckpointReader(path) as r:
        return r.restore_state(name, template, expect_tag=expect_tag)
