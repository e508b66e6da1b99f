#!/bin/bash
# LVSC-scale rehearsal on a synthetic 29k-slice pool (VERDICT r2 item 8).
#
# The published LVSC protocol is ~29,086 slices at 224^2 trained for 40
# epochs (reference: README.md:11; inference.py:288 resolves ckp_39), an
# order of magnitude more data than CHAOS/ACDC.  This run validates, at
# that scale, through the real CLI drivers:
#   * the device-resident auto-decision (pool ~5.4 GiB f16+u8+u8 vs the
#     6 GiB/chip budget, train/loop.py) and, if it stays host-streaming,
#     the native npz loader's throughput;
#   * heterogeneous slice extents (+-16 px) through the pad/crop path;
#   * the inference driver's bounded HD95 future backlog (evals/infer.py)
#     over a ~5.8k-slice eval fold.
#
# Quality is NOT the point here (phantoms are the 'easy' task; the
# three-arm quality study covers that) — this is the throughput/stability
# rehearsal.  Timings land in $ROOT/*.log; summarise into NOTES.md.
#
# Usage: bash scripts/lvsc_rehearsal.sh   (claims the TPU chip ~2 h;
# pre-generate the data first with scripts/gen_lvsc_data.py to keep the
# chip idle time zero).
set -u
cd /root/repo
ROOT=${LVSC_ROOT:-/root/repo/lvsc_rehearsal}
DATA=$ROOT/data
EPOCHS=${LVSC_EPOCHS:-40}
SLICES=${LVSC_SLICES:-29086}
mkdir -p "$ROOT"

if [ ! -f "$ROOT/DONE_train" ]; then
  echo "[$(date +%H:%M:%S)] training lvsc Experiment ($SLICES slices, $EPOCHS epochs)"
  python train_chaos.py --dataset lvsc --session Experiment --tag lvsc_scale \
      --fold 0 --epoch "$EPOCHS" \
      --do_loss_ent --do_decoder_consistency --do_aux_path --do_memory \
      --synthetic_data "$SLICES" --synthetic_size_jitter 16 \
      --data_root "$DATA" --run_dir "$ROOT/run-fold0" --max_restarts 2 \
      > "$ROOT/train.log" 2>&1 || { echo "TRAIN FAILED"; exit 1; }
  touch "$ROOT/DONE_train"
fi
echo "[$(date +%H:%M:%S)] evaluating (DSC + HD95 over the ~5.8k-slice fold)"
python inference.py --dataset lvsc --fold 0 \
    --checkpoint_file "$ROOT/run-fold0" --best_ckp --data_root "$DATA" \
    --root "$ROOT/outputs" \
    > "$ROOT/eval.log" 2>&1 || { echo "EVAL FAILED"; exit 1; }
touch "$ROOT/DONE"
echo "[$(date +%H:%M:%S)] rehearsal complete"
grep -E "s/epoch|staging|overall|slices in" "$ROOT/train.log" "$ROOT/eval.log" | tail -8
