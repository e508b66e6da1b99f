#!/bin/bash
# Three-arm quality study on a full synthetic CHAOS-shaped fold.
#
# Proves the pacing machinery pulls weight in THIS implementation: the
# reference's reason to exist is the +0.26 DSC gap between Baseline
# (UNet + pCE, session Control) and PacingPseudo (session Experiment)
# (/root/reference/README.md:114-115), bounded above by the fully
# supervised Upperbound (:116).  Each arm trains the same synthetic fold
# with the published protocol (400 epochs, batch 12, Adam 1e-4, poly
# decay — train_chaos.py:68-110) and is evaluated through the real
# inference driver (best checkpoint, DSC + HD95, per-patient protocol).
#
# The phantoms use difficulty=hard (data/synthetic.py): intensity-
# overlapping positional "anatomy" with distractor blobs — the easy
# round-2 fixtures let plain pCE reach 0.70 val Dice (Control arm,
# study_r3/Control_easytask), leaving no room to measure the pacing
# losses.
#
# Usage: bash scripts/quality_study.sh   (claims the TPU chip; arms are
# resumable — a finished arm leaves a DONE marker and is skipped)
set -u
cd /root/repo
ROOT=${STUDY_ROOT:-/root/repo/study_r3}
DATA=$ROOT/data
EPOCHS=${STUDY_EPOCHS:-400}
SLICES=${STUDY_SLICES:-1916}
DIFFICULTY=${STUDY_DIFFICULTY:-hard}
mkdir -p "$ROOT"

run_arm () {
  local session=$1; shift
  local rd=$ROOT/$session
  if [ -f "$rd/DONE" ]; then echo "skip $session (done)"; return 0; fi
  mkdir -p "$rd"
  echo "[$(date +%H:%M:%S)] training $session"
  python train_chaos.py --session "$session" --tag study_r3 --fold 0 \
      --modality t1 --epoch "$EPOCHS" --synthetic_data "$SLICES" \
      --synthetic_difficulty "$DIFFICULTY" \
      --data_root "$DATA" --run_dir "$rd/run-fold0" --max_restarts 2 "$@" \
      > "$rd/train.log" 2>&1 || { echo "$session TRAIN FAILED"; return 1; }
  echo "[$(date +%H:%M:%S)] evaluating $session"
  python inference.py --dataset chaost1 --fold 0 \
      --checkpoint_file "$rd/run-fold0" --best_ckp --data_root "$DATA" \
      --root "$rd/outputs" \
      > "$rd/eval.log" 2>&1 || { echo "$session EVAL FAILED"; return 1; }
  touch "$rd/DONE"
}

run_arm Control
run_arm Experiment --do_loss_ent --do_decoder_consistency --do_aux_path --do_memory
run_arm Upperbound
echo "[$(date +%H:%M:%S)] study complete"
for s in Control Experiment Upperbound; do
  echo "== $s =="; grep -E "overall|Per-patient" "$ROOT/$s/eval.log" 2>/dev/null | tail -3
done
