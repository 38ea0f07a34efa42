"""Loader tests against a miniature gobjverse-schema HDF5 fixture
(SURVEY.md §4: golden-batch snapshots without the 1.4TB dataset)."""

import h5py
import numpy as np
import pytest

from generativedensification_tpu.config import ConfigNode
from generativedensification_tpu.data import dataset_dict

V_TOTAL = 8
HW = 32


def _orbit_c2w(i, n, r=1.8):
    ang = 2 * np.pi * i / n
    eye = np.array([r * np.sin(ang), 0.25, -r * np.cos(ang)])
    fwd = -eye / np.linalg.norm(eye)
    right = np.cross(fwd, [0, 1.0, 0]); right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, -up, fwd, eye
    return c2w


@pytest.fixture(scope="module")
def mini_h5(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "mini.h5"
    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        for s in range(12):
            g = f.create_group(f"scene{s:03d}")
            for i in range(V_TOTAL):
                rgba = rng.integers(0, 255, (HW, HW, 4), dtype=np.uint8)
                rgba[..., 3] = (rng.uniform(size=(HW, HW)) > 0.5) * 255
                g.create_dataset(f"image_{i}", data=rgba)
                g.create_dataset(f"c2w_{i}", data=_orbit_c2w(i, V_TOTAL))
                g.create_dataset(
                    f"fov_{i}", data=np.array([0.8, 0.8], np.float32)
                )
            gg = g.create_group("groups")
            order = rng.permutation(V_TOTAL)
            for n in (2, 4):
                per = V_TOTAL // n
                for k in range(n):
                    gg.create_dataset(
                        f"groups_{n}_{k}",
                        data=order[k * per:(k + 1) * per].astype(np.uint8),
                    )
    return str(path)


def _cfg(root, split):
    return ConfigNode(
        {
            "dataset_name": "gobjeverse",
            "data_root": root,
            "split": split,
            "img_size": [HW, HW],
            "n_group": 4,
            "n_scenes": 100,
        }
    )


class TestGobjverseLoader:
    def test_batch_contract(self, mini_h5):
        ds = dataset_dict["gobjeverse"](_cfg(mini_h5, "train"))
        assert len(ds) > 0
        s = ds[0]
        V = V_TOTAL  # 4 source + 4 extra target views
        assert s["tar_rgb"].shape == (V, HW, HW, 3)
        assert s["tar_msk"].shape == (V, HW, HW)
        assert s["tar_c2w"].shape == (V, 4, 4)
        assert s["tar_ixt"].shape == (V, 3, 3)
        assert s["tar_rays"].shape == (V, HW, HW, 6)
        assert s["tar_rays_down"].shape == (V, HW // 16, HW // 16, 6)
        assert s["bg_color"].shape == (V, 3)
        assert s["near_far"].shape == (2,)
        np.testing.assert_allclose(
            s["tar_c2w"] @ s["tar_w2c"],
            np.tile(np.eye(4), (V, 1, 1)), atol=2e-5,
        )

    def test_first_view_alignment(self, mini_h5):
        # the canonical "align cameras using first view" block
        # (reference gobjverse.py:68-75): view 0 sits at distance r on -z
        ds = dataset_dict["gobjeverse"](_cfg(mini_h5, "test"))
        s = ds[0]
        pos0 = s["tar_c2w"][0, :3, 3]
        r = np.linalg.norm(pos0)
        np.testing.assert_allclose(pos0, [0, 0, -r], atol=1e-5)
        nf = s["near_far"]
        assert nf[0] == pytest.approx(r - 0.8, abs=1e-5)
        assert nf[1] == pytest.approx(r + 0.8, abs=1e-5)

    def test_split_disjoint_and_test_deterministic(self, mini_h5):
        tr = dataset_dict["gobjeverse"](_cfg(mini_h5, "train"))
        te = dataset_dict["gobjeverse"](_cfg(mini_h5, "test"))
        assert not set(map(str, tr.scenes_name)) & set(map(str, te.scenes_name))
        a, b = te[0], te[0]
        assert a["meta"]["tar_view"] == b["meta"]["tar_view"]
        np.testing.assert_array_equal(a["tar_rgb"], b["tar_rgb"])
        # test-split backgrounds are all white
        np.testing.assert_allclose(a["bg_color"], 1.0)

    def test_rays_match_cameras(self, mini_h5):
        ds = dataset_dict["gobjeverse"](_cfg(mini_h5, "test"))
        s = ds[0]
        rays = s["tar_rays"]
        # origins equal camera centers; directions pass through pixels
        for v in range(2):
            np.testing.assert_allclose(
                rays[v, ..., :3],
                np.broadcast_to(s["tar_c2w"][v, :3, 3], (HW, HW, 3)),
                atol=1e-5,
            )
            # center pixel ray ~ camera forward axis
            d = rays[v, HW // 2, HW // 2, 3:]
            d = d / np.linalg.norm(d)
            fwd = s["tar_c2w"][v, :3, 2]
            assert np.dot(d, fwd) > 0.99

    def test_masks_follow_alpha(self, mini_h5):
        ds = dataset_dict["gobjeverse"](_cfg(mini_h5, "test"))
        s = ds[0]
        m = s["tar_msk"]
        assert set(np.unique(m)).issubset({0.0, 1.0})
        assert 0.2 < m.mean() < 0.8


def test_batchloader_propagates_worker_errors():
    """r5: a dataset exception inside the prefetch thread must surface in
    the consumer (it used to drain as a bare StopIteration)."""
    from generativedensification_tpu.data.pipeline import BatchLoader

    class Broken:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            raise ValueError("boom")

    bl = BatchLoader(Broken(), 2, shuffle=False,
                     process_index=0, process_count=1)
    with pytest.raises(RuntimeError, match="worker failed"):
        next(iter(bl))
