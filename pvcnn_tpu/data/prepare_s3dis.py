"""S3DIS offline preparation: raw annotation txts -> per-room npy -> h5 windows.

Same pipeline and on-disk format as the reference (reference:
data/s3dis/prepare_data.py): per-room xyzrgb.npy/label.npy, then 1.5 m XY blocks
at two offsets (zero/half), merge of small blocks into neighbors, grid-based
uniform resampling, splits into <=max_num_points windows, 9-channel features
[x_in_block, y_in_block, z, r, g, b, x/X, y/Y, z/Z] and `indices_split_to_full`
back-mapping for scene-level voting eval.

Run: python -m pvcnn_tpu.data.prepare_s3dis -d <raw_dir> -f <out_dir>
"""

from __future__ import annotations

import argparse
import math
import os

import numpy as np

OBJECT_DICT = {
    "clutter": 0, "ceiling": 1, "floor": 2, "wall": 3, "beam": 4, "column": 5,
    "door": 6, "window": 7, "table": 8, "chair": 9, "sofa": 10, "bookcase": 11,
    "board": 12,
}


def prepare_labels(data_dir: str, output_dir: str):
    """Annotation txts -> per-room xyzrgb.npy + label.npy."""
    for area in sorted(os.listdir(data_dir)):
        area_path = os.path.join(data_dir, area)
        if not os.path.isdir(area_path):
            continue
        for room in sorted(os.listdir(area_path)):
            annotations = os.path.join(area_path, room, "Annotations")
            if not os.path.isdir(annotations):
                continue
            out_room = os.path.join(output_dir, area, room)
            if os.path.exists(os.path.join(out_room, ".labels")):
                print(f"{out_room} already processed, skipping")
                continue
            os.makedirs(out_room, exist_ok=True)
            xyz_parts, label_parts = [], []
            for obj in sorted(os.listdir(annotations)):
                key = obj.split("_", 1)[0]
                if key not in OBJECT_DICT:
                    continue
                try:
                    pts = np.loadtxt(os.path.join(annotations, obj))
                except ValueError as e:
                    print(f"ERROR loading {obj}: {e}")
                    continue
                xyz_parts.append(pts)
                label_parts.append(np.full((pts.shape[0], 1), OBJECT_DICT[key]))
            xyz_room = np.concatenate(xyz_parts, axis=0)
            label_room = np.concatenate(label_parts, axis=0)
            np.save(os.path.join(out_room, "xyzrgb.npy"), xyz_room)
            np.save(os.path.join(out_room, "label.npy"), label_room)
            open(os.path.join(out_room, ".labels"), "w").close()
            print(f"prepared {out_room}: {xyz_room.shape[0]} points")


def _grid_resample(point_indices, xyz, grid_size):
    """Grid-based uniform resampling of one block (prepare_data.py:196-215)."""
    block_points = xyz[point_indices]
    block_min = block_points.min(axis=0, keepdims=True)
    grids_of = np.floor((block_points - block_min) / grid_size).astype(np.int64)
    _, grid_ids, counts = np.unique(grids_of, return_inverse=True,
                                    return_counts=True, axis=0)
    per_grid = np.split(np.argsort(grid_ids), np.cumsum(counts[:-1]))
    avg = int(np.average(counts))
    out = []
    for idx_in_block in per_grid:
        repeat = math.ceil(avg / idx_in_block.shape[0])
        if repeat > 1:
            idx_in_block = np.repeat(idx_in_block, repeat)
            np.random.shuffle(idx_in_block)
            idx_in_block = idx_in_block[:avg]
        out.extend(point_indices[idx_in_block].tolist())
    return np.array(out)


def save_ply(path: str, points: np.ndarray, colors: np.ndarray | None = None):
    """Minimal binary-little-endian PLY writer (the reference's optional
    --save_ply used the plyfile package; this has no extra dependency)."""
    n = points.shape[0]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    props = ["property float x", "property float y", "property float z"]
    if colors is not None:
        props += ["property uchar red", "property uchar green",
                  "property uchar blue"]
    header = "\n".join([
        "ply", "format binary_little_endian 1.0", f"element vertex {n}",
        *props, "end_header", ""])
    if colors is not None:
        dtype = np.dtype([("xyz", "<f4", 3), ("rgb", "u1", 3)])
        rec = np.empty(n, dtype=dtype)
        rec["xyz"] = points.astype("<f4")
        rec["rgb"] = np.clip(colors, 0, 255).astype("u1")
    else:
        rec = points.astype("<f4")
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(rec.tobytes())


def prepare_windows(root: str, max_num_points=8192, block_size=1.5,
                    grid_size=0.03):
    import h5py

    batch_size = 2048
    for area_idx in range(1, 7):
        folder = os.path.join(root, f"Area_{area_idx}")
        if not os.path.isdir(folder):
            continue
        for dataset_idx, dataset in enumerate(sorted(os.listdir(folder))):
            marker = os.path.join(folder, dataset, ".dataset")
            if os.path.exists(marker):
                print(f"{folder}/{dataset} already processed, skipping")
                continue
            xyzrgb = np.load(os.path.join(folder, dataset, "xyzrgb.npy"))
            labels = np.load(os.path.join(folder, dataset,
                                          "label.npy")).astype(int).flatten()
            xyzrgb[:, 0:3] -= np.amin(xyzrgb, axis=0)[0:3]
            xyz, rgb = np.split(xyzrgb, [3], axis=-1)
            rgb = rgb / 255.0
            max_room = xyz.max(axis=0)

            data = np.zeros((batch_size, max_num_points, 9))
            data_num = np.zeros(batch_size, dtype=np.int32)
            label = np.zeros(batch_size, dtype=np.int32)
            label_seg = np.zeros((batch_size, max_num_points), dtype=np.int32)
            split_to_full = np.zeros((batch_size, max_num_points),
                                     dtype=np.int32)

            for offset_name, offset in [("zero", 0.0), ("half", block_size / 2)]:
                idx_h5 = 0
                idx = 0
                xyz_min = xyz.min(axis=0, keepdims=True) - offset
                xyz_max = xyz.max(axis=0, keepdims=True)
                bsize = (block_size, block_size,
                         2 * (xyz_max[0, -1] - xyz_min[0, -1]))  # no z split
                xyz_blocks = np.floor((xyz - xyz_min) / bsize).astype(np.int64)

                blocks, block_ids, block_counts = np.unique(
                    xyz_blocks, return_inverse=True, return_counts=True, axis=0)
                block_point_indices = np.split(
                    np.argsort(block_ids), np.cumsum(block_counts[:-1]))
                block_map = {(b[0], b[1]): i for i, b in enumerate(blocks)}

                # merge small blocks into a big neighbor
                threshold = max_num_points / 10
                for bi in range(blocks.shape[0]):
                    if block_counts[bi] >= threshold:
                        continue
                    b = (blocks[bi][0], blocks[bi][1])
                    for dx, dy in [(0, 1), (1, 0), (0, -1), (-1, 0), (-1, 1),
                                   (1, 1), (1, -1), (-1, -1)]:
                        nbr = block_map.get((b[0] + dx, b[1] + dy))
                        if nbr is None or block_counts[nbr] < threshold:
                            continue
                        block_point_indices[nbr] = np.concatenate(
                            [block_point_indices[nbr], block_point_indices[bi]])
                        block_point_indices[bi] = np.array([], dtype=np.int64)
                        break

                last_nonempty = max(
                    (bi for bi in range(blocks.shape[0])
                     if block_point_indices[bi].shape[0]), default=-1)

                for bi in range(last_nonempty + 1):
                    if block_point_indices[bi].shape[0] == 0:
                        continue
                    block_point_indices[bi] = _grid_resample(
                        block_point_indices[bi], xyz, grid_size)

                for bi in range(last_nonempty + 1):
                    point_indices = block_point_indices[bi]
                    if point_indices.shape[0] == 0:
                        continue
                    n = point_indices.shape[0]
                    n_splits = int(math.ceil(n / max_num_points))
                    per = int(math.ceil(n / n_splits))
                    nums = [per] * n_splits
                    nums[-1] = n - per * (n_splits - 1)
                    starts = [0] + list(np.cumsum(nums))

                    np.random.shuffle(point_indices)
                    pts = xyz[point_indices]
                    block_rgb = rgb[point_indices]
                    block_labels = labels[point_indices]
                    x, y, z = np.split(pts, (1, 2), axis=-1)
                    norm = pts / max_room
                    x = x - (x.min() + block_size / 2)
                    y = y - (y.min() + block_size / 2)
                    feat = np.concatenate([x, y, z, block_rgb, norm], axis=-1)

                    for si in range(n_splits):
                        s, num = starts[si], nums[si]
                        j = idx % batch_size
                        data[j, :num] = feat[s:s + num]
                        data_num[j] = num
                        label[j] = dataset_idx
                        label_seg[j, :num] = block_labels[s:s + num]
                        split_to_full[j, :num] = point_indices[s:s + num]

                        flush = ((idx + 1) % batch_size == 0
                                 or (bi == last_nonempty and si == n_splits - 1))
                        if flush:
                            count = j + 1
                            path = os.path.join(folder, dataset,
                                                f"{offset_name}_{idx_h5}.h5")
                            with h5py.File(path, "w") as f:
                                f.create_dataset("data", data=data[:count])
                                f.create_dataset("data_num", data=data_num[:count])
                                f.create_dataset("label", data=label[:count])
                                f.create_dataset("label_seg",
                                                 data=label_seg[:count])
                                f.create_dataset("indices_split_to_full",
                                                 data=split_to_full[:count])
                            print(f"saved {path} ({count} windows)")
                            idx_h5 += 1
                        idx += 1
            open(marker, "w").close()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "-d", "--data", dest="data_dir",
        default="data/s3dis/Stanford3dDataset_v1.2_Aligned_Version")
    parser.add_argument("-f", "--folder", dest="output_dir",
                        default="data/s3dis/pointcnn")
    parser.add_argument("--max_num_points", "-m", type=int, default=8192)
    parser.add_argument("--block_size", "-b", type=float, default=1.5)
    parser.add_argument("--grid_size", "-g", type=float, default=0.03)
    args = parser.parse_args()
    prepare_labels(args.data_dir, args.output_dir)
    prepare_windows(args.output_dir, args.max_num_points, args.block_size,
                    args.grid_size)


if __name__ == "__main__":
    main()
