#!/usr/bin/env bash
# ShapeNet part-segmentation data (same archive the reference uses)
set -e
cd "$(dirname "$0")"
wget -c https://shapenet.cs.stanford.edu/media/shapenetcore_partanno_segmentation_benchmark_v0_normal.zip
unzip -q shapenetcore_partanno_segmentation_benchmark_v0_normal.zip
rm shapenetcore_partanno_segmentation_benchmark_v0_normal.zip
