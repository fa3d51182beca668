#!/usr/bin/env bash
# Sample end-to-end pipeline (the bwbble-tpu analog of mg-ref/sample_usage.sh):
# build a multi-genome from VCFs + a reference FASTA, index it, align reads,
# emit SAM, and lift bubble hits back to reference coordinates.
#
# Usage: scripts/sample_usage.sh <ref.fasta> <reads.fastq> <out_dir> [vcf...]
set -euo pipefail

REF=${1:?ref.fasta}
READS=${2:?reads.fastq}
OUT=${3:?out_dir}
shift 3

REPO=$(cd "$(dirname "$0")/.." && pwd)
MGREF="$REPO/native/build/mgref"
BWBBLE="$REPO/bwbble"

[ -x "$MGREF" ] || python -m bwbble_tpu.build_native

mkdir -p "$OUT" "$OUT/mg-ref-output"
cd "$OUT"

# 1. extract SNPs/INDELs per chromosome from the VCFs
if [ "$#" -gt 0 ]; then
  "$MGREF" data_prep -c "$@"
fi

# 2. fold SNPs into IUPAC codes; append indel bubbles
"$MGREF" comb "$REF" mg.fasta mg_bubble.fasta bubble.data

# 3. index the multi-genome (fwd + reverse complement)
"$BWBBLE" index mg_bubble.fasta

# 4. align (inexact, up to 4 diffs) and emit SAM
"$BWBBLE" align -n 4 mg_bubble.fasta "$READS" out.aln
"$BWBBLE" aln2sam mg_bubble.fasta "$READS" out.aln out.sam

# 5. lift bubble-aligned reads back to reference coordinates (bC/bP tags)
"$MGREF" sam_pad bubble.data out.sam out.padded.sam

echo "done: $OUT/out.padded.sam"
