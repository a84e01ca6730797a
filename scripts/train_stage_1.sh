#!/bin/bash
# Stage-1 alignment training (reference: /root/reference/train_stage_1.sh —
# res 512, eff. batch 256 = 16/dev x 4 devices x grad-accum 4, 6000 steps,
# lr 5e-5 cosine, warmup 300, noise_offset 0.02, EMA interval 100).
# Here: one pjit process over the whole mesh; per-device batch x mesh size
# replaces the DeepSpeed process group.
python -m faithdiff_tpu.cli train \
    --stage 1 \
    --output_dir "${OUTPUT_DIR:-runs/stage1}" \
    --hr_dir "$HR_DIR" --lr_dir "$LR_DIR" --caption_dir "$CAPTION_DIR" \
    --resolution 512 \
    --train_batch_size 64 \
    --max_train_steps 6000 \
    --learning_rate 5e-5 \
    --lr_scheduler cosine --lr_warmup_steps 300 \
    --noise_offset 0.02 \
    --ema_update_interval 100 \
    --checkpointing_steps 2000 \
    --validation_steps 500 \
    "$@"
