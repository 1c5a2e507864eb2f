#!/usr/bin/env bash
# Per-dataset-family launch recipes (counterpart of reference
# gnn/train_gcn.sh:11-225). Usage: scripts/train_gcn.sh <family> [model]
set -euo pipefail
FAMILY=${1:-planetoid}
MODEL=${2:-stegcn}
RUN="python -m laplace_gnn_tpu.training.experiment"

case "$FAMILY" in
  planetoid)
    for DS in cora citeseer pubmed; do
      $RUN --dataset "$DS" --model_type "$MODEL" \
        --hessian_structure kron --subset_of_weights all \
        --n_epochs 400 --lr 1e-3 --hidden_channels 64 \
        --n_hypersteps 10 --marglik_frequency 20 --n_epochs_burnin 50 \
        --n_data_rand_splits 10
    done ;;
  webkb)
    for DS in texas wisconsin cornell; do
      $RUN --dataset "$DS" --model_type "$MODEL" \
        --n_epochs 200 --lr 0.01 --hidden_channels 32 \
        --n_hypersteps 10 --marglik_frequency 10 --n_epochs_burnin 40 \
        --n_data_rand_splits 10
    done ;;
  wiki)
    for DS in chameleon squirrel; do
      $RUN --dataset "$DS" --model_type "$MODEL" \
        --n_epochs 300 --lr 0.005 --hidden_channels 64 \
        --n_hypersteps 10 --marglik_frequency 20 --n_epochs_burnin 50 \
        --n_data_rand_splits 10
    done ;;
  actor)
    $RUN --dataset actor --model_type "$MODEL" \
      --n_epochs 200 --lr 0.01 --hidden_channels 32 \
      --n_hypersteps 10 --marglik_frequency 10 --n_epochs_burnin 40 \
      --n_data_rand_splits 10 ;;
  karate)
    $RUN --dataset karate --model_type "$MODEL" \
      --n_data_rand_splits 5 ;;
  banana|moons)
    $RUN --dataset "$FAMILY" --model_type "$MODEL" \
      --n_epochs 150 --lr 0.01 --hidden_channels 16 --dropout_p 0.2 \
      --n_hypersteps 5 --marglik_frequency 10 --n_epochs_burnin 30 \
      --overwrite_config true --weight_decay 5e-4 --res false \
      --n_data_rand_splits 5 ;;
  sbm)
    $RUN --dataset sbm --model_type "$MODEL" --n_data_rand_splits 3 ;;
  *)
    echo "Unknown family: $FAMILY (planetoid|webkb|wiki|actor|karate|banana|moons|sbm)" >&2
    exit 1 ;;
esac
