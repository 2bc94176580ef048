"""CLI subcommands end-to-end on the CPU mesh."""

import os

import pandas as pd
import pytest

from multimodalautoencoder_tpu import cli
from multimodalautoencoder_tpu.data import synthetic


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    return synthetic.write_csv(
        str(tmp_path_factory.mktemp("d") / "c.csv"), num_rows=200, seed=8)


def test_train_fill_embed(csv_path, tmp_path):
    ckpt_dir = str(tmp_path / "ckpt")
    rc = cli.main(["train", csv_path, "--arch", "12", "6",
                   "--num-steps", "60", "--learning-rate", "1e-3",
                   "--batch-size", "8", "--normalize-and-fill",
                   "--checkpoint-dir", ckpt_dir])
    assert rc == 0
    ckpts = [f for f in os.listdir(ckpt_dir) if f.endswith(".npz")]
    assert len(ckpts) == 1
    ckpt = os.path.join(ckpt_dir, ckpts[0])

    rc = cli.main(["fill", csv_path, "--checkpoint", ckpt,
                   "--normalize-and-fill"])
    assert rc == 0
    filled = os.path.join(os.path.dirname(csv_path),
                          "MMAE_filled-" + os.path.basename(csv_path))
    assert os.path.exists(filled)

    rc = cli.main(["embed", csv_path, "--checkpoint", ckpt,
                   "--normalize-and-fill"])
    assert rc == 0
    emb = os.path.join(os.path.dirname(csv_path),
                       "embedding-" + os.path.basename(csv_path))
    assert "ae_embedding_dim0" in pd.read_csv(emb).columns


def test_baseline_cli(csv_path, tmp_path):
    rc = cli.main(["baseline", "lr", csv_path, "happy_label",
                   "--results-path", str(tmp_path), "--folds", "2",
                   "--normalize-and-fill"])
    assert rc == 0
    out = [f for f in os.listdir(tmp_path) if f.startswith("LR-")]
    assert out


def test_baseline_cli_z_score_normalization(csv_path, tmp_path, capsys):
    """--normalization z_score is the reference baseline CLIs'
    Z_SCORE_FILL_WITH_0 dataset-prep mode (comparison_algorithms/
    svm.py:14,143-150: z-score normalize, scattered NaN filled with
    the default 0)."""
    rc = cli.main(["baseline", "lr", csv_path, "happy_label",
                   "--results-path", str(tmp_path), "--folds", "2",
                   "--normalize-and-fill", "--normalization", "z_score"])
    assert rc == 0
    out = [f for f in os.listdir(tmp_path) if f.startswith("LR-")]
    assert out
    # the CLI's own loader wiring ran in z-score mode: build the loader
    # exactly as cmd_baseline does and check the prep discriminates.
    # -1.5 is below the between_0_and_1+gap-sentinel minimum of -1.0,
    # so this only passes if z-scoring actually happened; and the
    # reference's Z_SCORE_FILL_WITH_0 mode fills modality gaps with 0,
    # not the -1.0 sentinel (svm.py:143-150 -> data_funcs.py:416-420)
    import argparse

    import numpy as np

    ns = argparse.Namespace(normalize_and_fill=True,
                            normalization="z_score", seed=0,
                            engine="pandas")
    dl = cli._loader(csv_path, True, ns, wanted_label="happy_label")
    X = np.asarray(dl.train_X)
    assert X.min() < -1.5                        # z-scored, not [0, 1]
    assert not np.isclose(X, -1.0).all(axis=1).any()  # no sentinel rows
    assert dl.fill_gaps_with is None


def test_feature_select_cli(csv_path):
    rc = cli.main(["feature-select", csv_path, "pca", "5",
                   "--fill-missing", "0.0"])
    assert rc == 0
    assert os.path.exists(os.path.join(
        os.path.dirname(csv_path), "pca_" + os.path.basename(csv_path)))


def test_jobs_cli(tmp_path):
    jf = tmp_path / "jobs.txt"
    jf.write_text(f"A\necho hi\n{tmp_path}/a.txt\n")
    rc = cli.main(["jobs", str(jf), "--min-seconds", "0"])
    assert rc == 0
    jf2 = tmp_path / "jobs2.txt"
    jf2.write_text(f"B\nexit 2\n{tmp_path}/b.txt\n")
    assert cli.main(["jobs", str(jf2), "--min-seconds", "0"]) == 1


def test_sweep_cli_rejects_z_score(csv_path):
    """The z-score prep belongs to the baseline CLIs only
    (comparison_algorithms/svm.py:143-150); the MMAE sweeps fix
    sigmoid-CE reconstruction of 0-1 inputs, so the flag combination is
    rejected instead of silently training against unbounded targets."""
    import pytest
    with pytest.raises(SystemExit, match="z_score"):
        cli.main(["sweep-mmae", csv_path, "--normalization", "z_score"])
    with pytest.raises(SystemExit, match="z_score"):
        cli.main(["sweep-classification", csv_path, csv_path,
                  "--normalization", "z_score"])


def test_sweep_mmae_cli_flags_wired(csv_path, tmp_path, monkeypatch):
    """--backend/--probe/--process-shard/--save-best-params reach the
    MMAESweep constructor (the Python surface, wrappers.py)."""
    captured = {}

    class FakeSweep:
        def __init__(self, *a, **kw):
            captured.update(kw)

        def run(self):
            return ({}, None, {})

    from multimodalautoencoder_tpu.sweep import wrappers
    monkeypatch.setattr(wrappers, "MMAESweep", FakeSweep)
    rc = cli.main(["sweep-mmae", csv_path, "--normalize-and-fill",
                   "--backend", "xla", "--probe", "none",
                   "--process-shard", "1", "4", "--save-best-params",
                   "--results-path", str(tmp_path)])
    assert rc == 0
    assert captured["backend"] == "xla"
    assert captured["probe"] is None
    assert captured["process_shard"] == (1, 4)
    assert captured["save_best_params"] is True


def test_sweep_mmae_cli_probe_default(csv_path, tmp_path, monkeypatch):
    captured = {}

    class FakeSweep:
        def __init__(self, *a, **kw):
            captured.update(kw)

        def run(self):
            return ({}, None, {})

    from multimodalautoencoder_tpu.sweep import wrappers
    monkeypatch.setattr(wrappers, "MMAESweep", FakeSweep)
    rc = cli.main(["sweep-mmae", csv_path, "--normalize-and-fill",
                   "--results-path", str(tmp_path)])
    assert rc == 0
    assert captured["probe"] == "device"
    assert captured["process_shard"] is None
    assert captured["backend"] == "auto"


def test_sweep_classification_cli_flags_wired(csv_path, tmp_path,
                                              monkeypatch):
    captured = {}

    class FakeSweep:
        def __init__(self, *a, **kw):
            captured.update(kw)

        def run(self):
            return {}

    from multimodalautoencoder_tpu.sweep import wrappers
    monkeypatch.setattr(wrappers, "MMAEClassificationSweep", FakeSweep)
    rc = cli.main(["sweep-classification", csv_path, csv_path,
                   "--normalize-and-fill", "--backend", "pallas",
                   "--process-shard", "0", "2", "--save-best-params",
                   "--results-path", str(tmp_path)])
    assert rc == 0
    assert captured["backend"] == "pallas"
    assert captured["process_shard"] == (0, 2)
    assert captured["save_best_params"] is True


def test_merge_shards_cli(tmp_path, capsys):
    """merge-shards merges the per-host ledger CSVs and names the
    cross-host best checkpoint from the shard winner exports."""
    import numpy as np

    from multimodalautoencoder_tpu.config import MMAEConfig
    from multimodalautoencoder_tpu.train import checkpoint as ck

    for i in range(2):
        pd.DataFrame([{"arch": i, "val_acc": 0.5 + i / 10}]).to_csv(
            tmp_path / f"MMAE-d.shard{i}of2.csv")
        ck.save_checkpoint(
            str(tmp_path), f"best_mmae.shard{i}of2",
            {"w": np.zeros((2, 2))}, MMAEConfig(num_feats=4), step=10,
            extra={"score": 0.5 + i / 10, "min_or_max": "max"})
    rc = cli.main(["merge-shards", str(tmp_path), "MMAE-d",
                   "--best-checkpoint", "best_mmae"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "best_mmae.shard1of2-10.npz" in out
    merged = pd.read_csv(tmp_path / "MMAE-d.csv", index_col=0)
    assert len(merged) == 2

    rc = cli.main(["merge-shards", str(tmp_path), "MMAE-d",
                   "--best-checkpoint", "nonexistent"])
    assert rc == 1
