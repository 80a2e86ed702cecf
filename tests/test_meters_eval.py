"""Meters, vote-reduction kernels, rotated IoU, and config-system tests."""

import numpy as np
import pytest

from pvcnn_tpu.meters.s3dis import MeterS3DIS
from pvcnn_tpu.meters.shapenet import MeterShapeNet


class TestMeterShapeNet:
    def test_perfect_prediction_is_one(self, rng):
        meter = MeterShapeNet()
        targets = np.full((2, 32), 12, dtype=np.int64)   # Chair: classes 12-15
        outputs = np.zeros((2, 32, 50), dtype=np.float32)
        outputs[:, :, 12] = 10.0
        meter.update(outputs, targets)
        assert meter.compute() == 1.0

    def test_restricted_argmax(self, rng):
        # huge logit outside the shape's range must be ignored
        meter = MeterShapeNet()
        targets = np.full((1, 16), 4, dtype=np.int64)    # Bag: classes 4-5
        outputs = np.zeros((1, 16, 50), dtype=np.float32)
        outputs[:, :, 30] = 100.0                        # out-of-range class
        outputs[:, :, 4] = 1.0
        meter.update(outputs, targets)
        assert meter.compute() == 1.0

    def test_empty_union_counts_as_one(self):
        meter = MeterShapeNet()
        targets = np.full((1, 8), 12, dtype=np.int64)
        outputs = np.zeros((1, 8, 50), dtype=np.float32)
        outputs[:, :, 12] = 5.0
        meter.update(outputs, targets)   # classes 13-15 unused: iou 1 each
        assert meter.compute() == 1.0


class TestMeterS3DIS:
    def test_overall_and_iou(self, rng):
        logits = rng.randn(4, 64, 13).astype(np.float32)
        labels = rng.randint(0, 13, size=(4, 64))
        pred = logits.argmax(-1)

        overall = MeterS3DIS(metric="overall")
        overall.update(logits, labels)
        assert overall.compute() == pytest.approx(np.mean(pred == labels))

        iou_m = MeterS3DIS(metric="iou")
        iou_m.update(logits, labels)
        want = 0.0
        for c in range(13):
            tgt, p = labels == c, pred == c
            union = np.sum(tgt | p)
            want += 1.0 if tgt.sum() == 0 else np.sum(tgt & p) / union
        assert iou_m.compute() == pytest.approx(want / 13)

    def test_accumulates_across_batches(self, rng):
        m1 = MeterS3DIS(metric="overall")
        a = (rng.randn(2, 16, 13).astype(np.float32),
             rng.randint(0, 13, size=(2, 16)))
        b = (rng.randn(3, 16, 13).astype(np.float32),
             rng.randint(0, 13, size=(3, 16)))
        m1.update(*a)
        m1.update(*b)
        got = m1.compute()
        pred = np.concatenate([a[0].argmax(-1).ravel(), b[0].argmax(-1).ravel()])
        lbl = np.concatenate([a[1].ravel(), b[1].ravel()])
        assert got == pytest.approx(np.mean(pred == lbl))


class TestVoteReduction:
    def test_shapenet_votes_keep_max_confidence(self, rng):
        from pvcnn_tpu.evaluate.shapenet.eval import update_shape_predictions
        n_points, n_votes = 10, 50
        point_idx = rng.randint(0, n_points, size=n_votes)
        conf = rng.rand(n_votes).astype(np.float32)
        pred = rng.randint(0, 5, size=n_votes)
        confidences = np.zeros(n_points, np.float32)
        predictions = np.full(n_points, -1, np.int64)
        update_shape_predictions(conf, pred, point_idx, confidences, predictions)
        for p in range(n_points):
            votes = point_idx == p
            if votes.any():
                best = np.argmax(conf[votes])
                assert confidences[p] == conf[votes].max()
                assert predictions[p] == pred[votes][best]
            else:
                assert predictions[p] == -1

    def test_s3dis_votes_respect_existing(self, rng):
        from pvcnn_tpu.evaluate.s3dis.eval import update_scene_predictions
        scene_conf = np.array([0.9, 0.1, 0.0], np.float32)
        scene_pred = np.array([7, 3, -1], np.int64)
        update_scene_predictions(
            np.array([0.5, 0.6, 0.2], np.float32),
            np.array([1, 2, 4], np.int64),
            np.array([0, 1, 2], np.int64), scene_conf, scene_pred)
        # point 0 keeps old higher-confidence vote; 1 and 2 get the new one
        np.testing.assert_array_equal(scene_pred, [7, 2, 4])
        np.testing.assert_allclose(scene_conf, [0.9, 0.6, 0.2])


class TestRotatedIoU:
    def test_axis_aligned_matches_manual(self):
        from pvcnn_tpu.evaluate.kitti.iou import rotate_iou_eval
        a = np.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
        b = np.array([[1.0, 0.0, 2.0, 2.0, 0.0]])      # half overlap
        iou = rotate_iou_eval(a, b)[0, 0]
        assert iou == pytest.approx(2.0 / 6.0, abs=1e-6)

    def test_rotation_invariance(self):
        from pvcnn_tpu.evaluate.kitti.iou import rotate_iou_eval
        for angle in [0.0, 0.3, 1.2, np.pi / 2]:
            a = np.array([[0.0, 0.0, 2.0, 1.0, angle]])
            iou = rotate_iou_eval(a, a)[0, 0]
            assert iou == pytest.approx(1.0, abs=1e-6)

    def test_disjoint_is_zero(self):
        from pvcnn_tpu.evaluate.kitti.iou import rotate_iou_eval
        a = np.array([[0.0, 0.0, 1.0, 1.0, 0.2]])
        b = np.array([[10.0, 0.0, 1.0, 1.0, 1.0]])
        assert rotate_iou_eval(a, b)[0, 0] == 0.0

    def test_45_degree_square(self):
        from pvcnn_tpu.evaluate.kitti.iou import rotate_iou_eval
        # unit square vs itself rotated 45deg: intersection is a regular octagon
        a = np.array([[0.0, 0.0, 1.0, 1.0, 0.0]])
        b = np.array([[0.0, 0.0, 1.0, 1.0, np.pi / 4]])
        inter = 2 * (np.sqrt(2) - 1)
        want = inter / (2 - inter)
        assert rotate_iou_eval(a, b)[0, 0] == pytest.approx(want, abs=1e-6)

    def test_matches_box_iou_3d_bev(self, rng):
        # cross-check the training-meter IoU against the eval IoU on the same
        # random boxes (independent implementations)
        from pvcnn_tpu.evaluate.kitti.iou import rotate_iou_eval
        from pvcnn_tpu.meters.kitti.frustum import _corners_np
        from pvcnn_tpu.meters.kitti.utils import get_box_iou_3d
        for _ in range(20):
            c = rng.randn(2, 3) * 2
            c[:, 1] = 0
            sizes = rng.rand(2, 3) + 0.5
            headings = rng.rand(2) * 2 * np.pi
            corners = _corners_np(c, headings, sizes)
            _, iou2d_meter = get_box_iou_3d(corners[:1], corners[1:])
            bev = np.stack([c[:, 0], c[:, 2], sizes[:, 0], sizes[:, 1],
                            headings], axis=1)
            iou_eval = rotate_iou_eval(bev[:1], bev[1:])[0, 0]
            assert iou_eval == pytest.approx(iou2d_meter[0], abs=1e-6)


class TestKittiAP:
    def test_perfect_detections_give_100(self):
        from pvcnn_tpu.evaluate.kitti.official_eval import \
            get_official_eval_result

        # need >= 41 valid gt boxes so the 41 recall sample points all fill
        # (fewer gt leaves zero precision tail bins, same as the reference)
        rng = np.random.RandomState(0)
        gt_annos, dt_annos = [], []
        for _ in range(30):
            n = rng.randint(1, 4)
            loc = rng.randn(n, 3) * 5
            dims = rng.rand(n, 3) + 1.5
            rot = rng.rand(n) * 2 * np.pi
            bbox = np.stack([
                rng.rand(n) * 100, rng.rand(n) * 100,
                rng.rand(n) * 100 + 200, rng.rand(n) * 100 + 200], axis=1)
            gt = {"name": np.array(["Car"] * n), "truncated": np.zeros(n),
                  "occluded": np.zeros(n, np.int64), "alpha": np.full(n, -10.0),
                  "bbox": bbox, "dimensions": dims, "location": loc,
                  "rotation_y": rot, "score": np.zeros(n)}
            dt = dict(gt)
            dt["score"] = rng.rand(n) + 0.5
            gt_annos.append(gt)
            dt_annos.append(dt)
        _, results, _ = get_official_eval_result(gt_annos, dt_annos, [0])
        assert results["Car"]["3d"] == pytest.approx([100.0] * 3, abs=1e-6)
        assert results["Car"]["bev"] == pytest.approx([100.0] * 3, abs=1e-6)

    def test_no_detections_give_0(self):
        from pvcnn_tpu.evaluate.kitti.official_eval import \
            get_official_eval_result

        gt = {"name": np.array(["Car"]), "truncated": np.zeros(1),
              "occluded": np.zeros(1, np.int64), "alpha": np.full(1, -10.0),
              "bbox": np.array([[0, 0, 100, 100.0]]),
              "dimensions": np.ones((1, 3)), "location": np.zeros((1, 3)),
              "rotation_y": np.zeros(1), "score": np.zeros(1)}
        empty = {k: v[:0] for k, v in gt.items()}
        _, results, _ = get_official_eval_result([gt], [empty], [0])
        assert max(results["Car"]["3d"]) == 0.0


class TestConfigSystem:
    def test_save_path(self):
        from pvcnn_tpu.utils.common import get_save_path
        assert get_save_path("configs/shapenet/pvcnn/c1.py") == \
            "runs/shapenet.pvcnn.c1"
        assert "[" in get_save_path("configs/a/b.py", "configs/a/c.py")

    def test_override_parsing(self):
        from pvcnn_tpu.utils.config import Config
        c = Config()
        c.train = Config()
        c.update_from_arguments("--configs.train.lr=1e-3",
                                "--configs.train.name='x'",
                                "--configs.a.b.c", "(1,2)")
        assert c.train.lr == 1e-3
        assert c.train.name == "x"
        assert c.a.b.c == (1, 2)

    def test_factory_instantiation(self):
        from pvcnn_tpu.utils.config import Config

        class Thing:
            def __init__(self, x, sub=None):
                self.x, self.sub = x, sub

        c = Config(Thing)
        c.x = 5
        c.sub = Config(Thing)
        c.sub.x = 7
        t = c()
        assert t.x == 5 and isinstance(t.sub, Thing) and t.sub.x == 7

    def test_detached_not_instantiated(self):
        from pvcnn_tpu.utils.config import Config

        c = Config(dict)
        c.sub = Config(dict, _detach_=True)
        c.sub.y = 2
        out = c()
        assert isinstance(out["sub"], Config)


def test_box_corners_match_numpy_twin(rng):
    import jax.numpy as jnp

    from pvcnn_tpu.meters.kitti.frustum import _corners_np
    from pvcnn_tpu.nn.frustum import get_box_corners_3d
    centers = rng.randn(5, 3).astype(np.float32)
    headings = (rng.rand(5) * 2 * np.pi).astype(np.float32)
    sizes = (rng.rand(5, 3) + 0.5).astype(np.float32)
    got = np.asarray(get_box_corners_3d(jnp.asarray(centers),
                                        jnp.asarray(headings),
                                        jnp.asarray(sizes)))
    want = _corners_np(centers, headings, sizes)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
