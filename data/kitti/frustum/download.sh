#!/usr/bin/env bash
# Pickled KITTI frustum proposals (same archive the reference uses)
set -e
cd "$(dirname "$0")"
wget -c https://shapenet.cs.stanford.edu/media/frustum_data.zip
unzip -q frustum_data.zip
rm frustum_data.zip
