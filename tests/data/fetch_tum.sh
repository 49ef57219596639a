#!/usr/bin/env bash
# Fetch TUM RGB-D sequences for the real-data ATE tests (SURVEY.md §5
# fixtures row: "TUM sequences fetched by script when network exists,
# skipped otherwise"). Run from anywhere:
#
#   bash tests/data/fetch_tum.sh [sequence ...]
#
# Default sequence: rgbd_dataset_freiburg1_xyz (the north-star ATE fixture).
# Downloads + extracts into tests/data/, then writes an `associations.txt`
# per sequence (timestamp-matched rgb/depth pairs, the same association the
# reference's rgbd_tum binary expects as its 4th argv).
#
# tests/test_tum_real.py skips cleanly when the data is absent, and runs the
# real ATE measurement the moment this script has succeeded.
set -euo pipefail

DATA_DIR="$(cd "$(dirname "$0")" && pwd)"
BASE_URL="https://cvg.cit.tum.de/rgbd/dataset"

seqs=("${@:-rgbd_dataset_freiburg1_xyz}")

for seq in "${seqs[@]}"; do
    # freiburgN -> dataset subdir
    fr="$(echo "$seq" | grep -o 'freiburg[0-9]')"
    dest="$DATA_DIR/$seq"
    if [ -d "$dest" ] && [ -f "$dest/associations.txt" ]; then
        echo "already present: $dest"
        continue
    fi
    tgz="$DATA_DIR/$seq.tgz"
    url="$BASE_URL/$fr/$seq.tgz"
    echo "fetching $url ..."
    curl -fL --retry 3 -o "$tgz" "$url" || wget -O "$tgz" "$url"
    tar -xzf "$tgz" -C "$DATA_DIR"
    rm -f "$tgz"
    echo "associating rgb/depth timestamps ..."
    python - "$dest" <<'EOF'
import sys
from pathlib import Path

seq = Path(sys.argv[1])

def read(name):
    out = []
    for line in (seq / name).read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        t, rel = line.split()
        out.append((float(t), rel))
    return out

rgb, depth = read("rgb.txt"), read("depth.txt")
used, lines = set(), []
for t, rel in rgb:
    j = min(range(len(depth)), key=lambda j: abs(depth[j][0] - t))
    if abs(depth[j][0] - t) <= 0.02 and j not in used:
        used.add(j)
        lines.append(f"{t:.6f} {rel} {depth[j][0]:.6f} {depth[j][1]}")
(seq / "associations.txt").write_text("\n".join(lines) + "\n")
print(f"wrote {len(lines)} associations -> {seq/'associations.txt'}")
EOF
done

# Retrain the vocabulary on the freshly-fetched real imagery (round-3
# verdict: a real-data retrain hook must exist the moment data does). The
# synthetic corpus stays in the mix; TUM descriptors broaden it.
echo "retraining vocabulary on fetched TUM data ..."
( cd "$DATA_DIR/../.." && python -m plslam_tpu.loopclosing.train_vocab --tum "$DATA_DIR" )
