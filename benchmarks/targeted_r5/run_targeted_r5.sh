# Round-5 targeted matrix (VERDICT r4 "Next round #5"): targeted mode
# across 3 feasible-set families x 2 sizes x {PGD, Adam} on the in-repo
# pretrained tiny victim — the quantitative counterpart, across
# constraints, to the paper's §4.4 targeted experiment (reference sweep:
# submit_scan_range.py:48-49, 80-88). Each cell is a full run_attack run
# (the path that records per-epoch emission_rate / wer_to_target and
# final test emission in results.json; train/loop.py:444-449,561-566).
# Optimizer lrs follow the r4 recorded choices (PGD 1e-3, Adam 1e-4).
set -u
cd /root/repo
R=benchmarks/targeted_r5
mkdir -p $R

run_cell () {
  norm=$1; sizeflag=$2; size=$3; opt=$4; lr=$5
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

for opt_lr in "pgd 1e-3" "adam 1e-4"; do
  set -- $opt_lr; opt=$1; lr=$2
  run_cell snr snr_db 30 $opt $lr
  run_cell snr snr_db 50 $opt $lr
  run_cell linf linf_size 0.005 $opt $lr
  run_cell linf linf_size 0.0015 $opt $lr
  run_cell fletcher_munson fm_epsilon 30 $opt $lr
  run_cell fletcher_munson fm_epsilon 8.9 $opt $lr
done
echo TARGETED_R5_DONE
