"""Real-backend smokes behind the declared seams (round-4 verdict item 9).

This container ships neither Pillow nor lance, so these tests SKIP here —
but the day the environment gains them, the seams are exercised end to
end instead of only being declared. Each test drives the same stage class
the stubbed pipeline uses, swapping only the backend object.
"""

import numpy as np
import pyarrow as pa
import pytest


class _PillowBackend:
    """Minimal real decoder built on Pillow, implementing the seam
    protocol (decode()/resize()) that ImageFeatureExtractor accepts."""

    def __init__(self):
        from PIL import Image  # noqa: F401

        self._Image = Image

    def decode(self, payload: bytes) -> np.ndarray:
        import io

        return np.asarray(self._Image.open(io.BytesIO(payload)).convert("RGB"))

    def resize(self, img: np.ndarray, size: int) -> np.ndarray:
        return np.asarray(
            self._Image.fromarray(img).resize((size, size))
        )


def test_pillow_backend_through_image_extractor():
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    from PIL import Image

    from paper2table_ray.stages.multimodal import ImageFeatureExtractor

    # a real encoded PNG payload
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(40, 24, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    payload = buf.getvalue()

    ex = ImageFeatureExtractor(target_size=16, backend=_PillowBackend())
    decoded = ex.backend.decode(payload)
    assert decoded.shape == (40, 24, 3)
    feat = ex.features(decoded)
    assert feat.ndim == 1 and np.isfinite(feat).all()


def test_lance_roundtrip(tmp_path, ray_session):
    pytest.importorskip("lance")
    import ray.data

    from paper2table_ray.sources.io import read_table, write_table

    tbl = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                    "text": pa.array(["a", "b", "c"], pa.string())})
    path = str(tmp_path / "docs.lance")
    write_table(ray.data.from_arrow(tbl), path)
    back = read_table(path).to_pandas().sort_values("doc_id")
    assert back["text"].tolist() == ["a", "b", "c"]
