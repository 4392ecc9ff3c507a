"""sources/io.py storage seam: parquet fallback behavior (lance is not
installed in this sandbox — the seam must route .lance paths to the Lance
reader ONLY when the package exists, and everything else to parquet)."""

import pyarrow as pa
import pytest

from paper2table_ray.sources import io as pio


@pytest.mark.usefixtures("ray_session")
def test_round_trip_parquet_fallback(tmp_path):
    import ray.data

    tbl = pa.table({"doc_id": ["a", "b"], "n": [1, 2]})
    out = str(tmp_path / "t")
    pio.write_table(ray.data.from_arrow(tbl), out)
    back = pio.read_table(out).to_pandas().sort_values("doc_id")
    assert back["doc_id"].tolist() == ["a", "b"]
    assert back["n"].tolist() == [1, 2]
    # column projection pushes down through the seam
    cols = pio.read_table(out, columns=["n"]).schema().names
    assert cols == ["n"]


def test_lance_flag_matches_environment():
    try:
        import lance  # noqa: F401

        assert pio.HAVE_LANCE
    except ImportError:
        assert not pio.HAVE_LANCE
