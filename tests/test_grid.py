"""Grid enumeration + trimming (reference: generic_wrapper.py:140-185,
autoencoder_wrapper.py:138-155, svm.py:67-81)."""

from multimodalautoencoder_tpu.sweep import grid


def test_enumerate_cross_product():
    out = grid.enumerate_grid({"C": [1, 10], "beta": [0.1, 0.01]})
    assert len(out) == 4
    assert {"C": 1, "beta": 0.1} in out
    assert {"C": 10, "beta": 0.01} in out
    # deterministic order
    assert out == grid.enumerate_grid({"beta": [0.1, 0.01], "C": [1, 10]})


def test_empty_grid():
    assert grid.enumerate_grid({}) == [{}]


def test_add_extra_vae_params():
    base = grid.enumerate_grid({"tie_weights": [True, False],
                                "dropout_prob": [1.0, 0.5]})
    out = grid.add_extra_vae_params(base)
    # 4 DAE combos + 2 VAE combos (only tie_weights=False)
    assert len(out) == 6
    vae = [s for s in out if s.get("variational")]
    assert len(vae) == 2
    assert all(not s["tie_weights"] for s in vae)
    dae = [s for s in out if not s.get("variational")]
    assert len(dae) == 4


def test_add_extra_vae_params_tied_only_sweep():
    """The reference builds VAE combos from the cross product of the
    non-tie axes (autoencoder_wrapper.py:138-155), so even a sweep with
    tie_weights=[True] gets its full VAE set."""
    base = grid.enumerate_grid({"tie_weights": [True],
                                "dropout_prob": [1.0, 0.5]})
    out = grid.add_extra_vae_params(base)
    vae = [s for s in out if s.get("variational")]
    assert len(vae) == 2
    assert all(s["tie_weights"] is False for s in vae)
    assert sorted(s["dropout_prob"] for s in vae) == [0.5, 1.0]


def test_reference_grid_scale():
    """72 DAE + 36 VAE = 108 settings, the reference MMAE sweep scale
    (autoencoder_wrapper.py:127-155; SURVEY §6)."""
    params = {
        "architecture": [[1000, 100], [500, 100], [300, 100]],
        "tie_weights": [True, False],
        "dropout_prob": [1.0, 0.5],
        "weight_penalty": [0.0, 0.01, 0.001],
        "weight_initialization": ["normal"],
        "activation_func": ["softsign", "relu"],
    }
    out = grid.add_extra_vae_params(grid.enumerate_grid(params))
    assert len(out) == 108


def test_trim_vae_tied():
    s = [{"variational": True, "tie_weights": True},
         {"variational": True, "tie_weights": False},
         {"variational": False, "tie_weights": True}]
    assert len(grid.trim_vae_tied(s)) == 2


def test_trim_linear_beta():
    s = grid.enumerate_grid({"kernel": ["linear", "rbf"],
                             "beta": [0.1, 0.01], "C": [1]})
    out = grid.trim_linear_beta(s)
    linear = [x for x in out if x["kernel"] == "linear"]
    rbf = [x for x in out if x["kernel"] == "rbf"]
    assert len(linear) == 1 and len(rbf) == 2


def test_convert_param_dict():
    s = grid.convert_param_dict_for_use({
        "architecture": "[1000, 100]", "batch_size": "20.0",
        "optimizer": "<class 'GradientDescentOptimizer'>"})
    assert s["architecture"] == [1000, 100]
    assert s["batch_size"] == 20 and isinstance(s["batch_size"], int)
    assert s["optimizer"] == "sgd"


def test_bucketing():
    settings = grid.add_extra_vae_params(grid.enumerate_grid({
        "architecture": [[8, 4], [6, 4]],
        "tie_weights": [True, False],
        "dropout_prob": [1.0, 0.5],
    }))
    buckets = grid.bucket_settings(settings)
    # shape key = (arch, tie, variational): 2 archs x (tied, untied,
    # untied-vae) = 6 buckets
    assert len(buckets) == 6
    assert sum(len(b) for _, b in buckets) == len(settings)
    for key, items in buckets:
        for s in items:
            assert grid.bucket_key(s) == key
