"""Audio/video multimodal stages and IVF ANN."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from paper2table_ray.pipelines.extract import extract_pipeline
from paper2table_ray.stages.ann import IVFAssigner, ivf_topk, train_ivf_centroids
from paper2table_ray.stages.multimodal import (
    AudioFeatureExtractor,
    VideoFrameSampler,
    audio_feature_pipeline,
    synth_media_batch,
    video_frame_pipeline,
)

SF = "/root/testdata/sf0.001"


def _media_batch(n=4):
    spans = pa.table(
        {
            "kind": pa.array(["media"] * n),
            "media_ref": pa.array([f"m{i}" for i in range(n)]),
        }
    )
    return synth_media_batch(spans)


class TestAudioVideo:
    def test_audio_features_deterministic(self):
        batch = _media_batch()
        a1 = AudioFeatureExtractor()(batch)
        a2 = AudioFeatureExtractor()(batch)
        assert a1.equals(a2)
        assert (np.array(a1.column("duration_ms")) > 0).all()
        assert (np.array(a1.column("rms")) > 0).all()

    def test_video_sampler_flat_maps_frames(self):
        batch = _media_batch(2)
        frames = VideoFrameSampler(stride=5)(batch)
        assert frames.num_rows > 2  # more rows out than media in
        idx = frames.column("frame_idx").to_pylist()
        assert all(i % 5 == 0 for i in idx)
        feat0 = frames.column("feature")[0].as_py()
        assert abs(sum(feat0) - 1.0) < 1e-3  # normalized histogram


@pytest.mark.usefixtures("ray_session")
class TestMediaPipelines:
    def test_audio_pipeline(self):
        spans = extract_pipeline(SF)
        out = audio_feature_pipeline(spans).to_pandas()
        assert len(out) > 0
        assert set(out.columns) == {
            "media_ref", "duration_ms", "sample_rate", "rms", "zero_crossings",
        }

    def test_video_pipeline(self):
        spans = extract_pipeline(SF)
        out = video_frame_pipeline(spans).to_pandas()
        assert len(out) > 0
        assert (out.groupby("media_ref").size() >= 2).all()


@pytest.mark.usefixtures("ray_session")
class TestIVF:
    def test_ivf_topk_hits_exact_top1(self):
        ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
        t = pq.read_table(f"{SF}/embeddings.parquet")
        q = np.asarray(t.column("embedding").to_pylist()[3], dtype=np.float64)
        got = ivf_topk(ds, q, k=5, n_centroids=8, nprobe=8).to_pandas()
        # nprobe == n_centroids → exhaustive → must equal brute force
        m = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q)
        exp = np.asarray(t.column("vec_id"))[np.argsort(-(mn @ qn))[:5]]
        assert got["vec_id"].tolist() == exp.tolist()

    def test_ivf_partial_probe_contains_query_vec(self):
        ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
        t = pq.read_table(f"{SF}/embeddings.parquet")
        q = np.asarray(t.column("embedding").to_pylist()[0], dtype=np.float64)
        got = ivf_topk(ds, q, k=3, n_centroids=8, nprobe=2).to_pandas()
        assert got["vec_id"].iloc[0] == 0

    def test_centroids_deterministic(self):
        ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
        c1 = train_ivf_centroids(ds, n_centroids=4)
        c2 = train_ivf_centroids(ds, n_centroids=4)
        assert np.allclose(c1, c2)
