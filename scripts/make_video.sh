#!/bin/bash
# Assemble eval viz images into a video (rebuild of the reference
# scripts/make_video.sh). Usage: make_video.sh <viz_images_dir> [out.mp4]
set -e
VIZ_DIR=${1:?usage: make_video.sh <viz_images_dir> [out.mp4]}
OUT=${2:-$VIZ_DIR/../video.mp4}
ffmpeg -y -framerate 10 -pattern_type glob -i "$VIZ_DIR/*.png" \
    -c:v libx264 -pix_fmt yuv420p -vf "pad=ceil(iw/2)*2:ceil(ih/2)*2" "$OUT"
echo "Wrote $OUT"
