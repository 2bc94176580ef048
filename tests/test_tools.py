"""File tools, feature selection, job runner."""

import os

import jax
import numpy as np
import pandas as pd
import pytest

from multimodalautoencoder_tpu.config import MMAEConfig, TrainConfig
from multimodalautoencoder_tpu.data import feature_selection as fs
from multimodalautoencoder_tpu.data import synthetic
from multimodalautoencoder_tpu.data.loader import DataLoader
from multimodalautoencoder_tpu.models.corruption import NoiseSpec
from multimodalautoencoder_tpu.tools import files
from multimodalautoencoder_tpu.train import trainer
from multimodalautoencoder_tpu.utils import jobs


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("data") / "t.csv")
    synthetic.write_csv(path, num_rows=220, seed=3)
    dl = DataLoader(path, supervised=False, suppress_output=True,
                    normalize_and_fill=True, fill_gaps_with=-1.0)
    cfg = MMAEConfig(num_feats=dl.num_feats, layer_sizes=(16, 6)).validate()
    tcfg = TrainConfig(learning_rate=1e-3, batch_size=16, num_steps=150,
                       record_every_nth=50)
    spec = NoiseSpec.build(cfg, dl.modality_table)
    arr = dl.device_arrays()
    state = trainer.init_state(jax.random.PRNGKey(0), cfg, tcfg)
    state, _ = trainer.train_jit(state, cfg, tcfg, spec, arr["train_x"],
                                 arr["val_x"])
    return dl, cfg, state.params, path


def test_convert_file_to_embeddings(trained, tmp_path):
    dl, cfg, params, path = trained
    out = files.convert_file_to_embeddings(
        params, cfg, path, out_path=str(tmp_path / "emb.csv"))
    df = pd.read_csv(out, index_col=0)
    # embedding columns present and are REAL embeddings (bug 2.8.4 fixed:
    # not just copies of input features)
    assert f"ae_embedding_dim{cfg.embedding_size - 1}" in df.columns
    orig = pd.read_csv(path, index_col=0)
    assert not np.allclose(df["ae_embedding_dim0"].to_numpy()[:5],
                           orig[dl.wanted_feats[0]].to_numpy()[:5])
    # non-feature columns preserved
    assert "dataset" in df.columns and "user_id" in df.columns
    assert not any(f in df.columns for f in dl.wanted_feats)


def test_fill_missing_data_in_file(trained, tmp_path):
    dl, cfg, params, path = trained
    # craft an input with one missing modality (all -1)
    df = pd.read_csv(path, index_col=0)
    df = df.fillna(0.0)
    s, e = dl.modality_table.span(1)
    cols = [df.columns.get_loc(f) for f in dl.wanted_feats[s:e]]
    df.iloc[0, cols] = -1.0
    inp = str(tmp_path / "in.csv")
    df.to_csv(inp)

    out = files.fill_missing_data_in_file(params, cfg, dl, inp,
                                          out_path=str(tmp_path / "o.csv"))
    filled = pd.read_csv(out, index_col=0)
    row0 = filled.iloc[0][dl.wanted_feats].to_numpy(dtype=float)
    assert not (row0[s:e] == -1.0).any()      # missing span filled
    # untouched elsewhere
    row1_before = df.iloc[1][dl.wanted_feats].to_numpy(dtype=float)
    row1_after = filled.iloc[1][dl.wanted_feats].to_numpy(dtype=float)
    np.testing.assert_allclose(row1_after, row1_before)


def test_reconstruction_report(trained):
    dl, cfg, params, _ = trained
    rep = files.reconstruction_report(params, cfg, dl, dl.val_X,
                                      verbose=False)
    assert set(rep) == set(dl.modality_names)
    assert all(np.isfinite(v) for v in rep.values())


def test_pca_transform_backends(tmp_path):
    path = str(tmp_path / "f.csv")
    synthetic.write_csv(path, num_rows=150, seed=4, nan_frac=0.0,
                        gap_frac=0.0)
    _, X_train, X_all, logistics = fs.load_raw_data(path)
    t_sk, pca_sk = fs.transform_PCA(X_train, X_all, 5, backend="sklearn",
                                    verbose=False)
    t_jx, pca_jx = fs.transform_PCA(X_train, X_all, 5, backend="jax",
                                    verbose=False)
    assert t_sk.shape == t_jx.shape == (len(X_all), 5)
    # same subspace up to sign: |corr| of each component ~ 1
    for i in range(5):
        c = np.corrcoef(t_sk[:, i], t_jx[:, i])[0, 1]
        assert abs(abs(c) - 1) < 1e-2
    assert "dataset" in logistics


def test_skb_backends_agree(tmp_path):
    rng = np.random.default_rng(0)
    X = rng.random((120, 20))
    y = (X[:, 3] + 0.1 * rng.random(120) > 0.5).astype(float)
    _, idx_jax = fs.transform_select_K_best(X, y, X, K=4, backend="jax")
    _, idx_sk = fs.transform_select_K_best(X, y, X, K=4,
                                           backend="sklearn")
    assert 3 in idx_jax
    assert set(idx_jax) == set(idx_sk)


def test_create_transformed_dataset(tmp_path):
    path = str(tmp_path / "g.csv")
    synthetic.write_csv(path, num_rows=150, seed=4, nan_frac=0.0,
                        gap_frac=0.0)
    out = fs.create_transformed_dataset(path, "pca", 6, verbose=False)
    assert os.path.basename(out) == "pca_g.csv"
    df = pd.read_csv(out, index_col=0)
    assert "pca_dim5" in df.columns
    assert "dataset" in df.columns
    out2 = fs.create_transformed_dataset(path, "skb", 6,
                                         label="happy_label",
                                         verbose=False)
    assert os.path.basename(out2) == "skb_happy_label_g.csv"
    df2 = pd.read_csv(out2, index_col=0)
    assert "skb_dim0" in df2.columns


def test_job_runner(tmp_path):
    out1 = tmp_path / "o1.txt"
    out2 = tmp_path / "o2.txt"
    job_file = tmp_path / "jobs.txt"
    job_file.write_text(
        f"EchoJob\necho hello-world\n{out1}\n\n"
        f"FailJob\nexit 3\n{out2}\n")
    msgs = []
    results = jobs.run_jobs(str(job_file),
                            notify=lambda s, t: msgs.append(s),
                            minimum_seconds=0.0)
    assert len(results) == 2
    assert results[0].status == jobs.SUCCESS
    assert results[1].status == jobs.ERROR
    assert out1.read_text().strip() == "hello-world"
    assert any("ALL JOBS FINISHED" in m for m in msgs)

    # refusal to overwrite (run_jobs.py:123-129)
    results2 = jobs.run_jobs(str(job_file),
                             notify=lambda s, t: msgs.append(s),
                             minimum_seconds=0.0)
    assert results2[0].status == jobs.ERROR
    assert "SKIPPED" in [m for m in msgs if "EchoJob" in m][-1]


def test_job_runner_fast_warning(tmp_path):
    out = tmp_path / "o.txt"
    job_file = tmp_path / "jobs.txt"
    job_file.write_text(f"Quick\ntrue\n{out}\n")
    results = jobs.run_jobs(str(job_file), notify=lambda s, t: None,
                            minimum_seconds=600)
    assert results[0].status == jobs.WARNING


def test_helpers_surface():
    """helper_funcs.py parity: time split (:1-15), friendly names
    (:17-31), and the module-level get_rmse (multimodal_autoencoder.py
    :1218-1220, sqrt of sklearn mean_squared_error)."""
    import numpy as np
    from sklearn.metrics import mean_squared_error

    from multimodalautoencoder_tpu.utils import helpers

    assert helpers.get_secs_mins_hours_from_secs(3723.9) == (1, 2, 3)
    assert helpers.get_friendly_label_name("tomorrow_Happy_label") == \
        "happiness"
    assert helpers.get_friendly_label_name("odd_label") == "odd"

    rng = np.random.default_rng(0)
    x, y = rng.random((7, 3)), rng.random((7, 3))
    assert helpers.get_rmse(x, y) == pytest.approx(
        float(np.sqrt(mean_squared_error(x, y))))


def test_job_file_nonblank_separator_is_loud(tmp_path):
    """A non-blank 4th line must not silently shift fields (under the
    reference's blind stride-4, job NAMES become shell COMMANDS)."""
    job_file = tmp_path / "jobs.txt"
    job_file.write_text("Job1\ntrue\nout1.txt\nNOTE: not blank\n"
                        "Job2\ntrue\nout2.txt\n")
    with pytest.raises(ValueError, match="blank separator"):
        jobs.load_job_file(str(job_file))


def test_skb_indices_match_transform_with_nan_scores():
    """A constant feature yields a NaN F-score; the reported indices
    must be the columns transform() actually kept."""
    rng = np.random.default_rng(0)
    X = rng.random((50, 6))
    X[:, 2] = 0.5                      # constant -> NaN f_classif score
    y = (X[:, 0] > 0.5).astype(int)
    Xt, idx = fs.transform_select_K_best(X, y, X, K=3)
    assert 2 not in idx
    np.testing.assert_array_equal(Xt, X[:, np.sort(idx)])
