# Round-5 quality suite: drive the saturated norms into their unsaturated
# regime (VERDICT r4 "Next round #3").
#
# Part A — weak-end sweep cells for the families whose r4 dose-response was
# a flat pertWER=1.0 ceiling (max_phon 15..70, min_max_freqs 100..1000 Hz),
# plus tv below 1e-3:
#   - max_phon {1,5,10}: expected to STAY saturated — the reference formula
#     scaled_thresh = spl(phon,f) - max(spl) + phon_reference_db pins the
#     lowest-frequency bin at phon_reference_db (65 dB ⇒ sinusoid amplitude
#     ~7, vs waveforms in [-1,1]) at EVERY phon level; the phon knob only
#     shapes the mid-band. Measured thresholds: see analysis.md.
#   - min_max_freqs {5,16,25,50} Hz upper cutoff (bin width 15.6 Hz: 5 Hz
#     keeps the DC bin only).
#   - tv {1e-4, 3e-4}.
# Part B — the knob that actually binds max_phon: phon_reference_db swept
# {45,35,25,15,5} at the reference's max_phon=25 cell (one 1-cell sweep per
# level; separate save roots because the run-dir name encodes only
# norm/size/mode/opt).
set -u
cd /root/repo
R=benchmarks/quality_r5
mkdir -p $R

timeout 3600 python -m paa_tpu.cli.sweep \
  --model wav2vec2-tiny --checkpoint_path checkpoints/wav2vec2-tiny-synthetic.safetensors \
  --dataset synthetic --synthetic_samples 2048 --seed 5 \
  --optimizer_type pgd --lr 1e-4 --batch_size 32 \
  --epochs_per_cell 12 --early_stopping 4 \
  --norms max_phon,min_max_freqs,tv \
  --grid '{"max_phon":[1,5,10],"min_max_freqs":[5,16,25,50],"tv":[0.0001,0.0003]}' \
  --cell_artifacts --save_root $R/logs --no_resume \
  > $R/partA.log 2>&1
echo "partA exit=$?"

for db in 45 35 25 15 5; do
  timeout 1800 python -m paa_tpu.cli.sweep \
    --model wav2vec2-tiny --checkpoint_path checkpoints/wav2vec2-tiny-synthetic.safetensors \
    --dataset synthetic --synthetic_samples 2048 --seed 5 \
    --optimizer_type pgd --lr 1e-4 --batch_size 32 \
    --epochs_per_cell 12 --early_stopping 4 \
    --norms max_phon --grid "{\"max_phon\":[25]}" \
    --phon_reference_db $db \
    --cell_artifacts --save_root $R/logs_refdb_$db --no_resume \
    > $R/partB_refdb_$db.log 2>&1
  echo "partB refdb=$db exit=$?"
done
echo QUALITY_R5_DONE
