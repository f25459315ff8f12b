#!/usr/bin/env bash
# DTU training recipe (parity with the reference scripts/train_dtu.sh:20-45):
#   bash scripts/train_dtu.sh <exp_name> [extra args]
# Note: the reference passes --pos_enc 2 but its pos-enc flag is dead code
# (MVS4Net.py:51-52); this recipe matches the reference's *effective*
# behaviour (no positional encoding). Add --pos_enc 2 explicitly to enable
# the (wired) learned encoding here.
# Note: the reference also passes --l1ce_lw "0.003,1" but its loss reads a
# differently-named kwarg, so the mono L1 weight was effectively 0 upstream
# (train_mvs4.py:337 vs MVS4Net.py:197). Here the weight is applied as
# written (0.003) — pass --l1ce_lw "0,1" to reproduce the reference's
# effective training exactly.
set -euo pipefail

TRAIN_DATASET=${TRAIN_DATASET:-/data/DTU/mvs_training_512x640}
TRAINLIST=${TRAINLIST:-lists/dtu/train.txt}
TESTLIST=${TESTLIST:-lists/dtu/val.txt}

exp=$1
PY_ARGS=${@:2}

LOG_DIR="./outputs/$exp"
mkdir -p "$LOG_DIR"
echo "====== Check log: tail -f ${LOG_DIR}/log_${exp}.txt"

python train_mvs4.py \
  --logdir "$LOG_DIR" \
  --trainpath "$TRAIN_DATASET" \
  --trainlist "$TRAINLIST" \
  --testlist "$TESTLIST" \
  --dataset=dtu_yao4 \
  --train_nviews 5 \
  --interval_scale=1.0625 \
  --epochs=22 \
  --batch_size=6 \
  --l1ce_lw="0.003,1" \
  --wd=0.0001 \
  --lr=0.001 \
  --lrepochs="2,3,4,5,6,7,8,9,10,11,12,13,14,15,16,17,18,19,20,21:1.2" \
  --summary_freq 100 \
  --group_cor \
  --group_cor_dim="8,8,4,4" \
  --ndepths="8,8,4,4" \
  --depth_inter_r="0.5,0.5,0.5,1" \
  --rt \
  --mono \
  --mono_stg_itrpl="nearest" \
  --inverse_depth \
  --attn_temp 2 \
  --seed 0 \
  --bf16 \
  --no_remat \
  --warp_band 12 \
  --warp_xband 144 \
  $PY_ARGS 2>&1 | tee "$LOG_DIR/log_${exp}.txt"
# warp_band 12 / warp_xband 144: measured-fastest banded-warp windows on
# v5e (BENCH_NOTES round 4; train step 510 -> 499 ms). Both validated
# coverage-0 on the bench geometry via ops.warp_mxu.band_coverage — for a
# new dataset/rig, check coverage first or drop back to the conservative
# defaults (16/192).
# The warp-backward kernel defaults to --warp_bwd auto = v4 with in-kernel
# coordinates (v4_ik): this recipe measured 513 -> 433 (v4, _probe_r5c)
# -> 422-431 ms/step across runs (v4_ik, _probe_r5e/r5i/r5j), loss
# identical. Explicit --warp_bwd v1..v4 opts out of in-kernel coords.
