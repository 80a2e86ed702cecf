"""One-command released-checkpoint parity runs (reference README.md:76-147).

Real mode (needs network egress):

    python tools/parity.py shapenet_pvcnn_c0p25
    python tools/parity.py --list

downloads the dataset (data/*/download.sh), fetches the released `.pth.tar`
from hanlab.mit.edu (sha256 pinned in tools/parity_checksums.json on first
successful download, verified on every later run), runs the config's voting
evaluator through the same CLI a user would
(`train.py <config> --evaluate --configs.evaluate.best_checkpoint_path ...`),
and prints the measured metric next to the reference's released number.

Dry-run mode (zero egress — validates the full command path end-to-end):

    python tools/parity.py shapenet_pvcnn_c0p25 --dry-run

fabricates a micro dataset fixture + a synthetic torch `.pth.tar` through the
same structural mapping the released checkpoints use
(utils/checkpoint_import), then executes the IDENTICAL evaluate command. This
keeps the parity path a one-command latent: the day egress opens, only the
downloads are new.

S3DIS raw data is licence-gated behind a form (reference README.md:34) — the
real run checks the prepared root exists and prints the manual step if not.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT_DIR = os.path.join(REPO, "runs", "parity")
SUMS_PATH = os.path.join(REPO, "tools", "parity_checksums.json")
URL = "https://hanlab.mit.edu/files/pvcnn/{}.pth.tar"

# workload -> (config, dataset kind, released file stem, released metric,
#              metric name)  [reference README.md:76-126]
WORKLOADS = {
    "shapenet_pointnet": ("configs/shapenet/pointnet.py", "shapenet",
                          "shapenet.pointnet", 83.5, "mIoU"),
    "shapenet_pvcnn_c0p25": ("configs/shapenet/pvcnn/c0p25.py", "shapenet",
                             "shapenet.pvcnn.c0p25", 84.9, "mIoU"),
    "shapenet_pvcnn_c0p25_dml": ("configs/shapenet/pvcnn/c0p25.py",
                                 "shapenet", "shapenet.pvcnn.c0p25.dml",
                                 85.1, "mIoU"),
    "shapenet_pvcnn_c0p5": ("configs/shapenet/pvcnn/c0p5.py", "shapenet",
                            "shapenet.pvcnn.c0p5", 85.5, "mIoU"),
    "shapenet_pvcnn_c1": ("configs/shapenet/pvcnn/c1.py", "shapenet",
                          "shapenet.pvcnn.c1", 85.8, "mIoU"),
    "shapenet_pvcnn_c1_dml": ("configs/shapenet/pvcnn/c1.py", "shapenet",
                              "shapenet.pvcnn.c1.dml", 86.1, "mIoU"),
    "s3dis_pointnet": ("configs/s3dis/pointnet/area5.py", "s3dis",
                       "s3dis.pointnet.area5", 44.03, "mIoU"),
    "s3dis_pvcnn_c0p125": ("configs/s3dis/pvcnn/area5/c0p125.py", "s3dis",
                           "s3dis.pvcnn.area5.c0p125", 48.75, "mIoU"),
    "s3dis_pvcnn_c0p25": ("configs/s3dis/pvcnn/area5/c0p25.py", "s3dis",
                          "s3dis.pvcnn.area5.c0p25", 53.08, "mIoU"),
    "s3dis_pvcnn_c1": ("configs/s3dis/pvcnn/area5/c1.py", "s3dis",
                       "s3dis.pvcnn.area5.c1", 56.64, "mIoU"),
    "s3dis_pvcnn2_c0p5": ("configs/s3dis/pvcnn2/area5/c0p5.py", "s3dis",
                          "s3dis.pvcnn2.area5.c0p5", 58.30, "mIoU"),
    "s3dis_pvcnn2_c1": ("configs/s3dis/pvcnn2/area5/c1.py", "s3dis",
                        "s3dis.pvcnn2.area5.c1", 59.02, "mIoU"),
    "kitti_frustum_pointnet": ("configs/kitti/frustum/pointnet.py", "kitti",
                               "kitti.frustum.pointnet", 56.90,
                               "Car 3D AP (moderate)"),
    "kitti_frustum_pvcnne": ("configs/kitti/frustum/pvcnne.py", "kitti",
                             "kitti.frustum.pvcnne", 61.24,
                             "Car 3D AP (moderate)"),
}


def sha256(path):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def fetch_checkpoint(stem):
    os.makedirs(CKPT_DIR, exist_ok=True)
    path = os.path.join(CKPT_DIR, f"{stem}.pth.tar")
    if not os.path.exists(path):
        url = URL.format(stem)
        print(f"==> downloading {url}")
        subprocess.check_call(["wget", "-q", "-O", path, url])
    sums = {}
    if os.path.exists(SUMS_PATH):
        with open(SUMS_PATH) as f:
            sums = json.load(f)
    digest = sha256(path)
    if stem in sums:
        assert sums[stem] == digest, (
            f"sha256 mismatch for {path}: recorded {sums[stem]}, got "
            f"{digest} — delete the file to re-download")
    else:
        sums[stem] = digest
        with open(SUMS_PATH, "w") as f:
            json.dump(sums, f, indent=1, sort_keys=True)
        print(f"==> pinned sha256 {digest[:16]}… in {SUMS_PATH}")
    return path


def ensure_dataset(kind):
    if kind == "shapenet":
        root = os.path.join(REPO, "data", "shapenet",
                            "shapenetcore_partanno_segmentation_benchmark_v0"
                            "_normal")
        if not os.path.isdir(root):
            subprocess.check_call(
                ["bash", os.path.join(REPO, "data", "shapenet",
                                      "download.sh")])
        return root, []
    if kind == "kitti":
        root = os.path.join(REPO, "data", "kitti")
        if not os.path.isdir(os.path.join(root, "frustum_data")):
            subprocess.check_call(
                ["bash", os.path.join(root, "frustum", "download.sh")])
        return root, []
    # s3dis: licence-gated raw download, then prepare_s3dis
    root = os.path.join(REPO, "data", "s3dis", "pointcnn")
    if not os.path.isdir(root):
        raise SystemExit(
            "S3DIS raw data is licence-gated (reference README.md:34):\n"
            "  1. request Stanford3dDataset_v1.2_Aligned_Version from\n"
            "     http://buildingparser.stanford.edu/dataset.html\n"
            "  2. unzip under data/s3dis/raw\n"
            "  3. python -m pvcnn_tpu.data.prepare_s3dis data/s3dis/raw "
            f"{root}\n")
    return root, []


def run_evaluate(config, overrides, ckpt, num_votes=None):
    cmd = [sys.executable, os.path.join(REPO, "train.py"), config,
           "--evaluate",
           f"--configs.evaluate.best_checkpoint_path={ckpt}", *overrides]
    if num_votes is not None:
        cmd.append(f"--configs.evaluate.num_votes={num_votes}")
    print("==>", " ".join(cmd))
    subprocess.check_call(cmd, cwd=REPO)
    return ckpt[:-len(".pth.tar")] + ".eval.npy"


def report(kind, stats_path, expected, metric):
    stats = np.load(stats_path)
    if kind == "shapenet":
        got = stats[:, 0].sum() / max(stats[:, 1].sum(), 1) * 100
    elif kind == "s3dis":
        s = stats.sum(axis=-1)
        iou = s[2] / np.maximum(s[0] + s[1] - s[2], 1)
        got = iou.mean() * 100
    else:
        got = float("nan")  # kitti: the official AP table printed above
    print(f"==> measured {metric}: {got:.2f}  (released reference: "
          f"{expected:.2f}, paper tolerance ±0.2)")
    return got


# --------------------------------------------------------------------------
# dry-run fixtures (mirror tests/test_cli.py, tests/test_s3dis_pipeline.py,
# tests/test_kitti_pipeline.py micro datasets)
# --------------------------------------------------------------------------

def _dry_fixture(kind, tmp):
    sys.path.insert(0, REPO)
    if kind == "shapenet":
        from tests.test_voting_twins import micro_shapenet  # fixture fn

        class F:                                  # run the fixture body
            @staticmethod
            def mktemp(name):
                p = os.path.join(tmp, name)
                os.makedirs(p, exist_ok=True)
                import pathlib
                return pathlib.Path(p)

        root = micro_shapenet.__wrapped__(F)
        return root, ["--configs.dataset.num_points=32",
                      "--configs.model.width_multiplier=0.125"]
    if kind == "s3dis":
        from tests.test_voting_twins import s3dis_root

        class F:
            @staticmethod
            def mktemp(name):
                p = os.path.join(tmp, name)
                os.makedirs(p, exist_ok=True)
                import pathlib
                return pathlib.Path(p)

        root = s3dis_root.__wrapped__(F)
        return root, ["--configs.dataset.num_points=128"]
    raise SystemExit("dry-run supports shapenet and s3dis workloads (the "
                     "kitti micro pipeline runs in "
                     "tests/test_kitti_pipeline.py)")


def _dry_checkpoint(name, tmp):
    """Synthetic torch .pth.tar through the same structural mapping the
    released checkpoints use (tests/test_cli.py::test_evaluate_pth_tar_cli
    is the equality lock for this route)."""
    import torch

    from pvcnn_tpu.train.optim import Adam
    from pvcnn_tpu.train.trainer import Trainer
    from pvcnn_tpu.utils import checkpoint_import as ci
    from tests.test_checkpoint_import import synthetic_state_dict

    if name.startswith("shapenet_pvcnn"):
        from pvcnn_tpu.models.shapenet import PVCNN
        model = PVCNN(num_classes=50, num_shapes=16, extra_feature_channels=3,
                      width_multiplier=0.125)
        example = np.zeros((1, 32, 22), np.float32)
        mapping = ci.pvcnn_shapenet_mapping()
    elif name.startswith("s3dis_pvcnn2"):
        from pvcnn_tpu.models.s3dis import PVCNN2
        model = PVCNN2(num_classes=13, extra_feature_channels=6,
                       width_multiplier=1.0)
        example = np.zeros((1, 128, 9), np.float32)
        mapping = ci.pvcnn2_s3dis_mapping()
    elif name.startswith("s3dis_pvcnn"):
        from pvcnn_tpu.models.s3dis import PVCNN
        model = PVCNN(num_classes=13, extra_feature_channels=6,
                      width_multiplier=0.125)
        example = np.zeros((1, 128, 9), np.float32)
        mapping = ci.pvcnn_s3dis_mapping()
    else:
        raise SystemExit(f"no dry-run checkpoint builder for {name}")
    tx, _ = Adam(1e-3)
    trainer = Trainer(model, criterion=None, tx=tx)
    state = trainer.init_state(example)
    sd = synthetic_state_dict(mapping, state.params, state.batch_stats)
    path = os.path.join(tmp, "released.pth.tar")
    torch.save({"model": {k: torch.from_numpy(np.asarray(v))
                          for k, v in sd.items()}}, path)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workload", nargs="?")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--num-votes", type=int, default=None,
                    help="override evaluate.num_votes (dry-run uses 2)")
    args = ap.parse_args()
    if args.list or not args.workload:
        for name, (cfg, kind, stem, expected, metric) in WORKLOADS.items():
            print(f"{name:28s} {cfg:42s} {metric} {expected}")
        return
    cfg, kind, stem, expected, metric = WORKLOADS[args.workload]
    if args.dry_run:
        # parent-process jax work (fixture init_state) must not grab the
        # exclusive TPU tunnel; env vars alone are ignored under the axon
        # sitecustomize — the config update is what actually takes
        import jax

        jax.config.update("jax_platforms", "cpu")
        import tempfile
        with tempfile.TemporaryDirectory() as tmp:
            root, extra = _dry_fixture(kind, tmp)
            ckpt = _dry_checkpoint(args.workload, tmp)
            # CPU backend: the dry-run validates the command path, and the
            # shared TPU tunnel admits one job at a time
            overrides = [f"--configs.dataset.root={root}",
                         "--configs.seed=0", "--devices", "cpu", *extra]
            stats = run_evaluate(cfg, overrides, ckpt,
                                 args.num_votes or 2)
            report(kind, stats, expected, metric)
            print("==> DRY-RUN complete: command path exercised end-to-end "
                  "on synthetic fixtures (measured number is meaningless "
                  "by construction)")
        return
    root, extra = ensure_dataset(kind)
    ckpt = fetch_checkpoint(stem)
    overrides = [f"--configs.dataset.root={root}", *extra]
    stats = run_evaluate(cfg, overrides, ckpt, args.num_votes)
    report(kind, stats, expected, metric)


if __name__ == "__main__":
    main()
