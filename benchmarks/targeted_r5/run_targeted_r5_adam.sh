# Round-5 targeted matrix, Adam half — resumable remainder of
# run_targeted_r5.sh. The PGD half ran 2026-08-20 21:35–22:09 UTC; the
# tunnel then wedged at the first device transfer (device listing ok,
# HBM put hangs — the outage signature documented in docs/PERF.md
# round 3), eating the first two Adam cells. This script re-runs every
# Adam cell that has no results.json yet, with a watchdogged probe
# first so a dead tunnel fails fast instead of burning 1800 s per cell.
set -u
cd /root/repo
R=benchmarks/targeted_r5

python tools/probe_device.py 900 || { echo "PROBE_FAILED"; exit 3; }

run_cell () {
  norm=$1; sizeflag=$2; size=$3; opt=$4; lr=$5
  if [ -f $R/logs/targeted/synthetic/${norm}_*${size}*_targeted_${opt}/results.json ] 2>/dev/null; then
    echo "cell $norm $size $opt already done"; return
  fi
  timeout 1800 python -m paa_tpu.cli.run_attack \
    --model wav2vec2-tiny --checkpoint_path checkpoints/wav2vec2-tiny-synthetic.safetensors \
    --dataset synthetic --synthetic_samples 2048 --seed 5 \
    --attack_mode targeted --target delete --target_reps 5 \
    --norm_type $norm --$sizeflag $size \
    --optimizer_type $opt --lr $lr --batch_size 32 \
    --num_epochs 12 --early_stopping 6 \
    --save_root $R/logs --no_resume --num_items_to_inspect 4 \
    > $R/cell_${norm}_${size}_${opt}.log 2>&1
  echo "cell $norm $size $opt exit=$?"
}

run_cell snr snr_db 30 adam 1e-4
run_cell snr snr_db 50 adam 1e-4
run_cell linf linf_size 0.005 adam 1e-4
run_cell linf linf_size 0.0015 adam 1e-4
run_cell fletcher_munson fm_epsilon 30 adam 1e-4
run_cell fletcher_munson fm_epsilon 8.9 adam 1e-4
echo TARGETED_R5_ADAM_DONE
