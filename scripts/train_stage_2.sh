#!/bin/bash
# Stage-2 joint finetune (reference: /root/reference/train_stage_2.sh —
# 40000 steps, denoise_encoder lr 5e-6 + UNet lr 5e-5).
python -m faithdiff_tpu.cli train \
    --stage 2 \
    --output_dir "${OUTPUT_DIR:-runs/stage2}" \
    --pretrained_params_dir "${STAGE1_DIR:-runs/stage1/export}" \
    --hr_dir "$HR_DIR" --lr_dir "$LR_DIR" --caption_dir "$CAPTION_DIR" \
    --resolution 512 \
    --train_batch_size 64 \
    --max_train_steps 40000 \
    --learning_rate 5e-5 \
    --vis_learning_rate 5e-6 \
    --lr_scheduler cosine --lr_warmup_steps 300 \
    --noise_offset 0.02 \
    --ema_update_interval 100 \
    --checkpointing_steps 2000 \
    --validation_steps 500 \
    "$@"
