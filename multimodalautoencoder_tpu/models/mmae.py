"""Pure-functional multimodal autoencoder (MMAE) for TPU.

The reference builds a TF1 graph held in a class
(``/root/reference/multimodal_autoencoder.py``: build_graph :344, encode
:454, decode :499, classify :520).  Here the model is an ``init``/``apply``
pair over a parameter pytree so it composes with jit/vmap/pjit:

- encoder: ``len(layer_sizes)`` dense layers, activation+dropout on all but
  the bottleneck (:461-475);
- decoder: mirrored sizes, activation+dropout on all but the output layer
  (:499-518); weight tying = transpose of encoder weights at apply time
  (:283-284) with always-independent decode biases (:291-293);
- VAE: variance head from the *second-to-last* hidden layer (:298-302,
  :464-465), reparameterized ``z = mu + eps * exp(log_var)`` (:372-375);
- classification head: dense layers from the embedding (:313-338, :520-540).

Initialization (:22-56): 'xavier' = uniform(+-const*sqrt(6/(fan_in+fan_out)));
'normal' = truncated normal with stddev 1/sqrt(fan_in); biases = 0.1.

All functions accept an optional traced ``act_id`` selecting the activation
via ``lax.switch`` so shape-identical configs with different activations can
be batched in one ``vmap`` (config-parallel sweeps).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from multimodalautoencoder_tpu.config import ACTIVATIONS, MMAEConfig
from multimodalautoencoder_tpu.models import losses as losses_lib

Array = jax.Array


class MMAEParams(NamedTuple):
    """Parameter pytree.  ``dec_w`` is empty when weights are tied; decode
    lists are stored in *decode order* (reference reverses them at
    :304-305).  ``cls_*`` are empty without a classification head."""

    enc_w: Tuple[Array, ...]
    enc_b: Tuple[Array, ...]
    dec_w: Tuple[Array, ...]
    dec_b: Tuple[Array, ...]
    var_w: Optional[Array]
    var_b: Optional[Array]
    cls_w: Tuple[Array, ...]
    cls_b: Tuple[Array, ...]


class MMAEOutputs(NamedTuple):
    mu: Array                    # encoder output before sampling
    log_var: Optional[Array]     # VAE only (reference's log-sigma)
    embedding: Array             # == mu, or sampled z for VAE
    decoded: Array               # raw decoder output (logits for sigmoid-CE)
    recon: Array                 # reconstruction in data space


def _layer_dims(cfg: MMAEConfig):
    """[(in, out)] for encoder layers."""
    dims = []
    prev = cfg.num_feats
    for size in cfg.layer_sizes:
        dims.append((prev, size))
        prev = size
    return dims


def _init_weight(rng: Array, shape, method: str, const: float) -> Array:
    fan_in, fan_out = shape
    if method == "xavier":
        bound = const * jnp.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(rng, shape, jnp.float32, -bound, bound)
    # 'normal': truncated normal (2 sigma), stddev 1/sqrt(fan_in)
    std = 1.0 / jnp.sqrt(jnp.asarray(fan_in, jnp.float32))
    return jax.random.truncated_normal(rng, -2.0, 2.0, shape,
                                       jnp.float32) * std


def init(rng: Array, cfg: MMAEConfig) -> MMAEParams:
    """Initialize all trainable parameters for ``cfg``."""
    cfg = cfg.validate()
    if cfg.num_feats <= 0:
        raise ValueError("cfg.num_feats must be set before init")
    dims = _layer_dims(cfg)
    n_layers = len(dims)

    keys = jax.random.split(rng, 2 * n_layers + 2)
    enc_w = tuple(_init_weight(keys[i], dims[i], cfg.weight_initialization,
                               cfg.xavier_const) for i in range(n_layers))
    enc_b = tuple(jnp.full((out,), 0.1, jnp.float32) for _, out in dims)

    if cfg.tie_weights:
        dec_w: Tuple[Array, ...] = ()
    else:
        dec_w = tuple(
            _init_weight(keys[n_layers + i], (dims[i][1], dims[i][0]),
                         cfg.weight_initialization, cfg.xavier_const)
            for i in reversed(range(n_layers)))
    dec_b = tuple(jnp.full((dims[i][0],), 0.1, jnp.float32)
                  for i in reversed(range(n_layers)))

    var_w = var_b = None
    if cfg.variational:
        var_w = _init_weight(keys[2 * n_layers],
                             (cfg.layer_sizes[-2], cfg.embedding_size),
                             cfg.weight_initialization, cfg.xavier_const)
        var_b = jnp.full((cfg.embedding_size,), 0.1, jnp.float32)

    cls_w: Tuple[Array, ...] = ()
    cls_b: Tuple[Array, ...] = ()
    if cfg.classification_layer_sizes is not None:
        cls_w, cls_b = init_head(keys[2 * n_layers + 1], cfg)

    return MMAEParams(enc_w, enc_b, dec_w, dec_b, var_w, var_b, cls_w, cls_b)


def init_head(rng: Array, cfg: MMAEConfig
              ) -> Tuple[Tuple[Array, ...], Tuple[Array, ...]]:
    """Fresh classification-head parameters only (the reference
    re-initializes the head before phase 2: set_classification_params ->
    rebuild_reinitialize, multimodal_autoencoder.py:898-930).  Split out
    of :func:`init` so phase-2 trainers can attach a fresh head to a
    headless phase-1 parameter stack."""
    cls_sizes = ((cfg.embedding_size,)
                 + tuple(cfg.classification_layer_sizes)
                 + (cfg.num_labels,))
    ckeys = jax.random.split(rng, len(cls_sizes) - 1)
    cls_w = tuple(
        _init_weight(ckeys[i], (cls_sizes[i], cls_sizes[i + 1]),
                     cfg.weight_initialization, cfg.xavier_const)
        for i in range(len(cls_sizes) - 1))
    cls_b = tuple(jnp.full((cls_sizes[i + 1],), 0.1, jnp.float32)
                  for i in range(len(cls_sizes) - 1))
    return cls_w, cls_b


def mxu_dot(a: Array, b: Array, bf16: bool) -> Array:
    """THE mixed-precision matmul policy, shared by the XLA model path
    and both Pallas kernel families (ops/pallas_kernels._kernel,
    ops/train_kernel._cls_train_kernel): with ``bf16`` the OPERANDS are
    cast to bfloat16 (2x MXU peak) while accumulation stays f32
    (preferred_element_type); storage, optimizer math, losses, and
    masks are the callers' responsibility and stay f32."""
    if bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _matmul(x: Array, w: Array, cfg: MMAEConfig) -> Array:
    """Dense matmul on the MXU (mixed-precision policy: mxu_dot)."""
    return mxu_dot(x, w, cfg.compute_dtype == "bfloat16")


def _activate(x: Array, name: str, act_id: Optional[Array]) -> Array:
    if act_id is not None:
        branches = [
            lambda v: v,                       # linear
            jax.nn.relu,
            jnp.tanh,
            jax.nn.soft_sign,
            jax.nn.softplus,
        ]
        return lax.switch(act_id, branches, x)
    if name == "relu":
        return jax.nn.relu(x)
    if name == "tanh":
        return jnp.tanh(x)
    if name == "softsign":
        return jax.nn.soft_sign(x)
    if name == "softplus":
        return jax.nn.softplus(x)
    return x  # linear


def activation_id(name: str) -> int:
    """Map an activation name to its ``lax.switch`` branch index."""
    table = {"linear": 0, "relu": 1, "tanh": 2, "softsign": 3, "softplus": 4}
    if name not in table:
        raise ValueError(f"unknown activation {name!r}")
    assert tuple(table) == ACTIVATIONS
    return table[name]


def _dropout(rng: Array, x: Array, keep_prob) -> Array:
    """TF-style dropout: keep with prob ``keep_prob``, scale by 1/keep_prob.
    ``keep_prob`` may be traced; 1.0 is the identity."""
    keep = jax.random.bernoulli(rng, keep_prob, x.shape)
    return jnp.where(keep, x / keep_prob, 0.0)


def _decode_weights(params: MMAEParams) -> Tuple[Array, ...]:
    """Decoder weight list in decode order; transposed encoder weights when
    tied (:283-284, :304)."""
    if params.dec_w:
        return params.dec_w
    return tuple(w.T for w in reversed(params.enc_w))


def encode(params: MMAEParams, cfg: MMAEConfig, x: Array, *,
           rng: Optional[Array] = None, keep_prob=1.0, train: bool = False,
           act_id: Optional[Array] = None
           ) -> Tuple[Array, Optional[Array]]:
    """Encoder forward (:454-475). Returns (mu, log_var|None)."""
    n = len(params.enc_w)
    use_pallas = cfg.use_pallas and act_id is None
    hidden = x
    log_var = None
    for i in range(n):
        if cfg.variational and i == n - 1:
            log_var = _matmul(hidden, params.var_w, cfg) + params.var_b
        if use_pallas:
            from multimodalautoencoder_tpu.ops import pallas_kernels
            act = cfg.activation if i < n - 1 else "linear"
            hidden = pallas_kernels.fused_dense(
                hidden, params.enc_w[i], params.enc_b[i], act,
                bf16=cfg.compute_dtype == "bfloat16")
        else:
            hidden = _matmul(hidden, params.enc_w[i], cfg) + params.enc_b[i]
            if i < n - 1:
                hidden = _activate(hidden, cfg.activation, act_id)
        if i < n - 1 and train:
            hidden = _dropout(jax.random.fold_in(rng, i), hidden,
                              keep_prob)
    return hidden, log_var


def decode(params: MMAEParams, cfg: MMAEConfig, embedding: Array, *,
           rng: Optional[Array] = None, keep_prob=1.0, train: bool = False,
           act_id: Optional[Array] = None) -> Array:
    """Decoder forward (:499-518). Raw output (logits for sigmoid-CE)."""
    ws = _decode_weights(params)
    use_pallas = cfg.use_pallas and act_id is None
    x = embedding
    for i, w in enumerate(ws):
        if use_pallas:
            from multimodalautoencoder_tpu.ops import pallas_kernels
            act = cfg.activation if i < len(ws) - 1 else "linear"
            x = pallas_kernels.fused_dense(
                x, w, params.dec_b[i], act,
                bf16=cfg.compute_dtype == "bfloat16")
        else:
            x = _matmul(x, w, cfg) + params.dec_b[i]
            if i < len(ws) - 1:
                x = _activate(x, cfg.activation, act_id)
        if i < len(ws) - 1 and train:
            x = _dropout(jax.random.fold_in(rng, 100 + i), x, keep_prob)
    return x


def classify(params: MMAEParams, cfg: MMAEConfig, embedding: Array, *,
             rng: Optional[Array] = None, keep_prob=1.0,
             train: bool = False, act_id: Optional[Array] = None) -> Array:
    """Classification head forward (:520-540) -> logits.

    Faithful mode reproduces the reference's gate bug: activation/dropout is
    applied when ``i < len(decode_weights)`` rather than when ``i`` is not
    the last classification layer (:533).
    """
    act = cfg.classification_activation or cfg.activation
    n_dec = len(cfg.layer_sizes)
    x = embedding
    for i, w in enumerate(params.cls_w):
        x = _matmul(x, w, cfg) + params.cls_b[i]
        gate = (i < n_dec - 1) if cfg.faithful_classify_gate \
            else (i < len(params.cls_w) - 1)
        if gate:
            x = _activate(x, act, act_id)
            if train:
                x = _dropout(jax.random.fold_in(rng, 200 + i), x, keep_prob)
    return x


def forward(params: MMAEParams, cfg: MMAEConfig, noisy_x: Array, *,
            rng: Optional[Array] = None, keep_prob=1.0, train: bool = False,
            sample: bool = True, act_id: Optional[Array] = None
            ) -> MMAEOutputs:
    """Full autoencoder forward (:367-390).

    For the VAE the reference *always* samples the embedding — including at
    evaluation time (the sampling op is baked into the graph, :372-375) — so
    ``sample`` defaults to True; pass False for a deterministic embedding.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    k_drop, k_eps = jax.random.split(rng)
    mu, log_var = encode(params, cfg, noisy_x, rng=k_drop,
                         keep_prob=keep_prob, train=train, act_id=act_id)
    embedding = mu
    if cfg.variational and sample:
        eps = jax.random.normal(k_eps, mu.shape, mu.dtype)
        embedding = mu + eps * jnp.exp(log_var)
    decoded = decode(params, cfg, embedding, rng=k_drop,
                     keep_prob=keep_prob, train=train, act_id=act_id)
    recon = jax.nn.sigmoid(decoded) if cfg.loss == "sigmoid_cross_entropy" \
        else decoded
    return MMAEOutputs(mu=mu, log_var=log_var, embedding=embedding,
                       decoded=decoded, recon=recon)


def total_loss(params: MMAEParams, cfg: MMAEConfig, noisy_x: Array,
               true_x: Array, *, rng: Optional[Array] = None, keep_prob=1.0,
               train: bool = False, weight_penalty=None,
               act_id: Optional[Array] = None):
    """Training objective (:380-408): reconstruction + L2 reg (+ KL).

    ``weight_penalty`` may be passed as a traced scalar to override
    ``cfg.weight_penalty`` (vmapped sweeps).  Returns ``(loss, aux)`` where
    aux carries the unregularized reconstruction loss and outputs.
    """
    penalty = cfg.weight_penalty if weight_penalty is None else weight_penalty
    out = forward(params, cfg, noisy_x, rng=rng, keep_prob=keep_prob,
                  train=train, act_id=act_id)
    recon_loss = losses_lib.reconstruction_loss(cfg.loss, out.decoded, true_x)

    reg_weights = list(params.enc_w) + list(_decode_weights(params))
    if cfg.variational:
        reg_weights.append(params.var_w)
    reg = losses_lib.weight_regularization(penalty, reg_weights)

    if cfg.variational:
        z_for_kl = out.embedding if cfg.faithful_kl_on_z else out.mu
        kl = losses_lib.kl_divergence_rows(z_for_kl, out.log_var)
        # reference: mean(scalar_recon + per-row kl) + reg (:406)
        loss = jnp.mean(recon_loss + kl) + reg
    else:
        kl = None
        loss = recon_loss + reg

    aux = {"recon_loss": recon_loss, "reg": reg, "kl": kl, "outputs": out}
    return loss, aux


def classification_total_loss(params: MMAEParams, cfg: MMAEConfig,
                              noisy_x: Array, true_y: Array, *,
                              rng: Optional[Array] = None, keep_prob=1.0,
                              train: bool = False, sample: bool = True,
                              weight_penalty=None,
                              enc_act_id: Optional[Array] = None,
                              cls_act_id: Optional[Array] = None):
    """Phase-2 objective (:431-441): classification loss on the embedding
    (+ L2 on classification weights only).  Gradients flow through the
    encoder, as in the reference where ``minimize`` spans all upstream
    variables (:443).

    ``weight_penalty`` / ``enc_act_id`` / ``cls_act_id`` may be traced
    per-config scalars (vmapped two-phase sweeps).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    k_drop, k_eps = jax.random.split(rng)
    mu, log_var = encode(params, cfg, noisy_x, rng=k_drop,
                         keep_prob=keep_prob, train=train,
                         act_id=enc_act_id)
    embedding = mu
    if cfg.variational and sample:
        eps = jax.random.normal(k_eps, mu.shape, mu.dtype)
        embedding = mu + eps * jnp.exp(log_var)
    logits = classify(params, cfg, embedding, rng=k_drop,
                      keep_prob=keep_prob, train=train, act_id=cls_act_id)
    loss = losses_lib.classification_loss(cfg.classification_loss, logits,
                                          true_y)
    penalty = cfg.classification_weight_penalty if weight_penalty is None \
        else weight_penalty
    loss = loss + losses_lib.weight_regularization(penalty,
                                                   list(params.cls_w))
    preds = losses_lib.classification_predictions(cfg.classification_loss,
                                                  logits)
    aux = {"logits": logits, "predictions": preds, "embedding": embedding}
    return loss, aux
