"""Corruption statistics vs the reference's add_noise_to_batch
(multimodal_autoencoder.py:668-702)."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodalautoencoder_tpu.config import MMAEConfig
from multimodalautoencoder_tpu.data.modalities import ModalityTable
from multimodalautoencoder_tpu.models.corruption import (NoiseSpec,
                                                         add_noise_to_batch)

TABLE = ModalityTable.from_feature_names(
    [f"call_f{i}" for i in range(10)] + [f"location_f{i}" for i in range(10)]
    + [f"screen_f{i}" for i in range(10)] + [f"sms_f{i}" for i in range(10)]
    + [f"survey_f{i}" for i in range(10)])


def cfg(**kw):
    base = dict(num_feats=TABLE.num_feats)
    base.update(kw)
    return MMAEConfig(**base).validate()


def test_element_dropout_rate():
    c = cfg(intelligent_noise=False, num_modalities_to_drop=0)
    spec = NoiseSpec.build(c, TABLE)
    assert spec.num_element_drops == int(50 * 0.05)  # == 2
    x = jnp.ones((2000, 50))
    noisy = add_noise_to_batch(jax.random.PRNGKey(0), x, spec)
    zero_rate = float((np.asarray(noisy) == 0).mean())
    # 2 draws with replacement out of 50: E[zeroed] = 1-(1-1/50)^2 ~ 3.96%
    assert 0.03 < zero_rate < 0.05


def test_uniform_modality_drop():
    c = cfg(intelligent_noise=False, num_modalities_to_drop=1,
            element_dropout_frac=0.0)
    spec = NoiseSpec.build(c, TABLE)
    x = jnp.ones((3000, 50))
    noisy = np.asarray(add_noise_to_batch(jax.random.PRNGKey(1), x, spec))
    masks = TABLE.feature_masks()
    # exactly one modality fully -1 per row
    per_row = np.stack([(noisy[:, s:e] == -1.0).all(axis=1)
                        for s, e in (TABLE.span(m) for m in range(5))], 1)
    assert (per_row.sum(axis=1) == 1).all()
    # roughly uniform across modalities
    frac = per_row.mean(axis=0)
    assert np.all(np.abs(frac - 0.2) < 0.04)
    del masks


def test_intelligent_noise_distribution():
    c = cfg(element_dropout_frac=0.0)
    spec = NoiseSpec.build(c, TABLE)
    n = 20000
    x = jnp.ones((n, 50))
    noisy = np.asarray(add_noise_to_batch(jax.random.PRNGKey(2), x, spec))
    loc = TABLE.span(TABLE.names.index("location"))
    call = TABLE.span(TABLE.names.index("call"))
    loc_missing = (noisy[:, loc[0]:loc[1]] == -1.0).all(axis=1)
    call_missing = (noisy[:, call[0]:call[1]] == -1.0).all(axis=1)
    # P(location missing) = p2 + p3 = 0.2512 + 0.0769 ~ 0.328
    assert abs(loc_missing.mean() - 0.32814) < 0.02
    # P(call missing) = p1 + p3 = 0.0317 + 0.0769 ~ 0.109
    assert abs(call_missing.mean() - 0.10862) < 0.015
    # call and sms always co-missing (same noise types)
    sms = TABLE.span(TABLE.names.index("sms"))
    sms_missing = (noisy[:, sms[0]:sms[1]] == -1.0).all(axis=1)
    assert (call_missing == sms_missing).all()
    # survey is never in any noise type
    sur = TABLE.span(TABLE.names.index("survey"))
    assert not (noisy[:, sur[0]:sur[1]] == -1.0).any()


def test_mask_overwrites_element_zeros():
    c = cfg(element_dropout_frac=1.0, intelligent_noise=False,
            num_modalities_to_drop=5, mask_with=-1.0)
    spec = NoiseSpec.build(c, TABLE)
    x = jnp.full((50, 50), 7.0)
    noisy = np.asarray(add_noise_to_batch(jax.random.PRNGKey(3), x, spec))
    # masked spans are exactly mask_with even where zeroing hit first
    assert set(np.unique(noisy)).issubset({-1.0, 0.0, 7.0})


def test_forced_type_mask():
    c = cfg(element_dropout_frac=0.0)
    spec = NoiseSpec.build(c, TABLE)
    forced = jnp.asarray(TABLE.feature_masks()[2])  # screen
    x = jnp.ones((4, 50))
    noisy = np.asarray(add_noise_to_batch(jax.random.PRNGKey(4), x, spec,
                                          forced_type_mask=forced))
    s, e = TABLE.span(2)
    assert (noisy[:, s:e] == -1.0).all()
    outside = np.ones(50, dtype=bool)
    outside[s:e] = False
    assert (noisy[:, outside] == 1.0).all()


def test_jit_and_vmap_compatible():
    c = cfg()
    spec = NoiseSpec.build(c, TABLE)
    f = jax.jit(add_noise_to_batch)
    out = f(jax.random.PRNGKey(0), jnp.ones((8, 50)), spec)
    assert out.shape == (8, 50)
    # vmap over a batch of keys (e.g. per-config corruption in a sweep)
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    vout = jax.vmap(lambda k: add_noise_to_batch(k, jnp.ones((8, 50)),
                                                 spec))(keys)
    assert vout.shape == (4, 8, 50)
