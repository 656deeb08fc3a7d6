#!/bin/bash
set -x
cd /root/repo/runs/r05_e2e
export PYTHONPATH=/root/.axon_site:/root/repo
E="python -m score_based_multimodal_autoencoder_tpu.cli.evaluate --synthetic --n-mod 10 --amount 256 --vae-ckpt ./vae --score-ckpt ./score --tpu-preset --clf-ckpt ./pm_clf"
$E --predicted 123456789 --noise-obs --fid-n-times 3 > eval_cond.json 2> eval_cond.log
$E > eval_uncond.json 2> eval_uncond.log
$E --incremental --target-mod 9 --noise-obs > eval_incr.json 2> eval_incr.log
python -m score_based_multimodal_autoencoder_tpu.cli.sample --synthetic --vae-ckpt ./vae --score-ckpt ./score --tpu-preset --n-mod 10 --amount 8 --given 0 --noise-obs --out grid_given0.png 2> sample1.log
python -m score_based_multimodal_autoencoder_tpu.cli.sample --synthetic --vae-ckpt ./vae --score-ckpt ./score --tpu-preset --n-mod 10 --amount 8 --out grid_uncond.png 2> sample2.log
echo EVAL_CHAIN_DONE
