#!/usr/bin/env bash
# Fetch the NeRF Blender-synthetic dataset (chair, lego, hotdog, ...).
#
# The reference repo ships only a README describing this data
# (/root/reference/data/nerf_synthetic/README.txt: 100 train / 100 val /
# 200 test images per scene at 800x800); the images themselves come from the
# original NeRF release.  This script tries the known public mirrors in
# order.  Run it OUTSIDE restricted environments (this build environment has
# no network egress — the parity harness, examples/parity_chair.py, falls
# back to a procedural Blender-format scene when the data is absent and
# records that fact in its report).
#
# Usage: ./examples/fetch_nerf_synthetic.sh [DEST_DIR]   (default: ./data)

set -euo pipefail

DEST="${1:-data}"
mkdir -p "$DEST"

if [ -d "$DEST/nerf_synthetic/chair" ]; then
  echo "nerf_synthetic already present at $DEST/nerf_synthetic"
  exit 0
fi

ZIP="$DEST/nerf_synthetic.zip"
MIRRORS=(
  # Hugging Face re-hosts of the original NeRF data release
  "https://huggingface.co/datasets/arnaudstiegler/nerf_synthetic/resolve/main/nerf_synthetic.zip"
  "https://huggingface.co/datasets/nerfstudio-project/blender/resolve/main/nerf_synthetic.zip"
  # Original release (Google Drive, id from bmild/nerf README) via gdown
  "gdrive:18JxhpWD-4ZmuFKLzKlAw-w5PpzZxXOcG"
)

for url in "${MIRRORS[@]}"; do
  echo "Trying $url ..."
  if [[ "$url" == gdrive:* ]]; then
    if command -v gdown >/dev/null 2>&1; then
      gdown "${url#gdrive:}" -O "$ZIP" && break
    else
      echo "  gdown not installed; skipping Google Drive mirror"
    fi
  else
    if curl -fL --retry 3 -o "$ZIP" "$url"; then break; fi
  fi
done

if [ ! -s "$ZIP" ]; then
  echo "ERROR: could not download nerf_synthetic.zip from any mirror." >&2
  echo "Download it manually (see github.com/bmild/nerf) into $DEST and unzip." >&2
  exit 1
fi

unzip -q "$ZIP" -d "$DEST"
rm -f "$ZIP"
echo "Done: $DEST/nerf_synthetic"
ls "$DEST/nerf_synthetic"
