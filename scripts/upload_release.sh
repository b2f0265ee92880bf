#!/usr/bin/env bash
# Circuit-artifact release mirror — parity with the reference's
# scripts/upload_release.sh (R2 -> S3 circuit artifact mirror).
#
# Packages a built circuit artifact directory (output of
# `python -m blobstreamx_tpu.runtime.function <entrypoint> build`) and pushes
# it to the configured object store so provers can fetch build-once
# artifacts instead of rebuilding.
#
# Usage: RELEASE_BUCKET=s3://bucket ./scripts/upload_release.sh <entrypoint> <build_dir>
set -euo pipefail

ENTRYPOINT=${1:?usage: upload_release.sh <entrypoint> <build_dir>}
BUILD_DIR=${2:?usage: upload_release.sh <entrypoint> <build_dir>}
BUCKET=${RELEASE_BUCKET:?set RELEASE_BUCKET (e.g. s3://blobstreamx-tpu-releases)}

VERSION=$(git rev-parse --short HEAD)
TARBALL="${ENTRYPOINT}-${VERSION}.tar.gz"

tar -czf "$TARBALL" -C "$BUILD_DIR" .
sha256sum "$TARBALL" > "$TARBALL.sha256"

if command -v aws >/dev/null 2>&1; then
  aws s3 cp "$TARBALL" "$BUCKET/$ENTRYPOINT/$VERSION/"
  aws s3 cp "$TARBALL.sha256" "$BUCKET/$ENTRYPOINT/$VERSION/"
elif command -v gsutil >/dev/null 2>&1; then
  gsutil cp "$TARBALL" "$TARBALL.sha256" "$BUCKET/$ENTRYPOINT/$VERSION/"
else
  echo "no object-store CLI (aws/gsutil) found; artifact left at $TARBALL" >&2
  exit 1
fi
echo "released $ENTRYPOINT@$VERSION -> $BUCKET"
