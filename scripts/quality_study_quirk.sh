#!/bin/bash
# Skeleton-scribble + eval-mode-BN variant of the quality study: completes
# the 2x2 {scribble style} x {BN regime} grid.
#
#   * study_r3          skeleton + train-mode BN   (quirk off, 400 ep)
#   * study_r3_dilated  dilated  + eval-mode BN    (protocol-faithful pair)
#   * study_r3_quirk    skeleton + eval-mode BN    (THIS script)
#
# The reference driver trains with the model left in eval mode from the
# first validation on (/root/reference/train_chaos.py:370 — model.eval()
# with no model.train() anywhere), i.e. BatchNorm frozen to running
# statistics; `--ref_quirk_bn_eval_after_first_epoch` reproduces that.
# Comparing this grid cell against study_r3 isolates the BN-regime effect
# at fixed supervision; comparing against study_r3_dilated isolates the
# scribble-richness effect at fixed BN regime.
#
# Reuses study_r3's data pool (same fold, same scribbles) — no regen.
# 200 epochs for the same reason as the dilated variant: every observed
# peak lands before epoch ~100 on this fold.
set -u
cd /root/repo
ROOT=${STUDY_ROOT:-/root/repo/study_r3_quirk}
DATA=${STUDY_DATA:-/root/repo/study_r3/data}
EPOCHS=${STUDY_EPOCHS:-200}
mkdir -p "$ROOT"

run_arm () {
  local session=$1; shift
  local rd=$ROOT/$session
  if [ -f "$rd/DONE" ]; then echo "skip $session (done)"; return 0; fi
  mkdir -p "$rd"
  echo "[$(date +%H:%M:%S)] training $session (skeleton + eval-mode BN)"
  python train_chaos.py --session "$session" --tag study_r3_quirk \
      --fold 0 --modality t1 --epoch "$EPOCHS" \
      --synthetic_data 1916 --synthetic_difficulty hard \
      --ref_quirk_bn_eval_after_first_epoch \
      --data_root "$DATA" --run_dir "$rd/run-fold0" --max_restarts 2 \
      "$@" > "$rd/train.log" 2>&1 || { echo "$session TRAIN FAILED"; return 1; }
  echo "[$(date +%H:%M:%S)] evaluating $session"
  python inference.py --dataset chaost1 --fold 0 \
      --checkpoint_file "$rd/run-fold0" --best_ckp --data_root "$DATA" \
      --root "$rd/outputs" \
      > "$rd/eval.log" 2>&1 || { echo "$session EVAL FAILED"; return 1; }
  touch "$rd/DONE"
}

run_arm Control
run_arm Experiment --do_loss_ent --do_decoder_consistency --do_aux_path --do_memory
echo "[$(date +%H:%M:%S)] quirk study complete"
python -m pacingpseudo_tpu.tools.study_summary --root "$ROOT" \
    --arms Control Experiment --json "$ROOT/summary.json" || true
