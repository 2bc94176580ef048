"""Native CSV loader: equivalence with pandas and loader integration."""

import numpy as np
import pandas as pd
import pytest

from multimodalautoencoder_tpu.data import fast_csv, synthetic
from multimodalautoencoder_tpu.data.loader import DataLoader

pytestmark = pytest.mark.skipif(not fast_csv.native_available(),
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    return synthetic.write_csv(
        str(tmp_path_factory.mktemp("d") / "n.csv"), num_rows=400, seed=2)


def test_numeric_parse_bit_exact(csv_path):
    """Values match pandas' correctly-rounded (round_trip) parser bit for
    bit; NaN positions identical."""
    df_n = fast_csv.read_dataframe(csv_path)
    df_rt = pd.read_csv(csv_path, index_col=0,
                        float_precision="round_trip")
    feats = [c for c in df_rt.columns if "_f" in c]
    a = df_n[feats].to_numpy()
    b = df_rt[feats].to_numpy()
    same = (a == b) | (np.isnan(a) & np.isnan(b))
    assert same.all()


def test_text_and_bool_columns(csv_path):
    df_n = fast_csv.read_dataframe(csv_path)
    df_p = pd.read_csv(csv_path, index_col=0)
    assert (df_n["dataset"] == df_p["dataset"]).all()
    assert (df_n["logistics_noisy"] == df_p["logistics_noisy"]).all()
    assert df_n["logistics_noisy"].dtype == bool
    assert list(df_n.columns) == list(df_p.columns)
    assert list(df_n.index) == list(df_p.index)


def test_edge_values(tmp_path):
    p = str(tmp_path / "edge.csv")
    with open(p, "w") as f:
        f.write(",a_x,b_y,dataset\n")
        f.write("0,1e-3,-2.5E+2,Train\n")
        f.write("1,,0.1234567890123456789,Val\n")   # empty + 19 digits
        f.write("2,nan,42,Test\n")
    df = fast_csv.read_dataframe(p)
    assert df.loc[0, "a_x"] == 1e-3
    assert df.loc[0, "b_y"] == -250.0
    assert np.isnan(df.loc[1, "a_x"])
    assert df.loc[1, "b_y"] == float("0.1234567890123456789")
    assert np.isnan(df.loc[2, "a_x"])  # 'nan' text -> NaN
    assert list(df["dataset"]) == ["Train", "Val", "Test"]


def test_loader_native_engine(csv_path):
    dl_n = DataLoader(csv_path, supervised=True, suppress_output=True,
                      normalize_and_fill=True, fill_gaps_with=-1.0,
                      engine="native", seed=0)
    dl_p = DataLoader(csv_path, supervised=True, suppress_output=True,
                      normalize_and_fill=True, fill_gaps_with=-1.0,
                      engine="pandas", seed=0)
    assert dl_n.num_feats == dl_p.num_feats
    assert dl_n.modality_names == dl_p.modality_names
    assert dl_n.train_X.shape == dl_p.train_X.shape
    # same seeded shuffle + near-identical parse -> same matrices
    np.testing.assert_allclose(dl_n.train_X, dl_p.train_X, rtol=1e-12)


def test_quoted_commas_and_extreme_exponents(tmp_path):
    """Commas inside quoted fields must not shift columns, and |net
    exponent| > 22 must take the correctly-rounded strtod path."""
    p = str(tmp_path / "q.csv")
    with open(p, "w") as f:
        f.write(',a_x,dataset,b_y\n')
        f.write('0,1.5,"Tr,ain",7.3e-25\n')
        f.write('1,2.5,Val,1.2345e30\n')
    df = fast_csv.read_dataframe(p)
    # pandas' default parser double-rounds 7.3e-25; round_trip is the
    # correctly-rounded (strtod-equal) reference
    df_p = pd.read_csv(p, index_col=0, float_precision="round_trip")
    assert list(df["a_x"]) == [1.5, 2.5]
    assert list(df["dataset"]) == ["Tr,ain", "Val"]
    assert df.loc[0, "b_y"] == df_p.loc[0, "b_y"] == 7.3e-25
    assert df.loc[1, "b_y"] == df_p.loc[1, "b_y"] == 1.2345e30


def test_slow_path_is_bounded_and_strict(tmp_path):
    """The strtod fallback must (a) reject garbage-suffixed numerics the
    way pandas does (non-numeric cell -> NaN under this loader's text
    contract), (b) parse 'inf' like pandas, and (c) stay inside the
    field even when the file has NO trailing newline (strtod runs on a
    NUL-terminated copy, never the raw mmap)."""
    p = str(tmp_path / "s.csv")
    with open(p, "w") as f:
        f.write(",a_x,b_y\n")
        f.write("0,12x,3.5\n")
        f.write("1,inf,-inf\n")
        # last row: long-mantissa slow-path value at EOF, no newline
        f.write("2,7.3e-25,0.12345678901234567891")
    df = fast_csv.read_dataframe(p)
    assert np.isnan(df.loc[0, "a_x"])          # "12x" is text, not 12
    assert df.loc[0, "b_y"] == 3.5
    assert df.loc[1, "a_x"] == float("inf")
    assert df.loc[1, "b_y"] == float("-inf")
    assert df.loc[2, "a_x"] == 7.3e-25
    assert df.loc[2, "b_y"] == float("0.12345678901234567891")
