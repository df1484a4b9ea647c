#!/bin/sh
# Download the task datasets into the reference directory layout
# (parity: scripts/download_ndh_r2r_data.sh + tasks/CVDN/data/download.sh).
# Matterport3D connectivity JSONs and scan imagery require the Matterport3D
# terms of use: https://niessner.github.io/Matterport/
set -e

mkdir -p srv/task_data/NDH/data srv/task_data/R2R/data srv/task_data/CVDN/data

# NDH (CVDN dialog navigation)
wget https://cvdn.dev/dataset/NDH/train_val/train.json -P srv/task_data/NDH/data/
wget https://cvdn.dev/dataset/NDH/train_val/val_seen.json -P srv/task_data/NDH/data/
wget https://cvdn.dev/dataset/NDH/train_val/val_unseen.json -P srv/task_data/NDH/data/
wget https://cvdn.dev/dataset/NDH/test_cleaned/test_cleaned.json \
    -O srv/task_data/NDH/data/test.json

# R2R
wget https://www.dropbox.com/s/hh5qec8o5urcztn/R2R_train.json -P srv/task_data/R2R/data/
wget https://www.dropbox.com/s/8ye4gqce7v8yzdm/R2R_val_seen.json -P srv/task_data/R2R/data/
wget https://www.dropbox.com/s/p6hlckr70a07wka/R2R_val_unseen.json -P srv/task_data/R2R/data/
wget https://www.dropbox.com/s/w4pnbwqamwzdwd1/R2R_test.json -P srv/task_data/R2R/data/

# CVDN gameplay (question-asking classifier)
wget https://cvdn.dev/dataset/CVDN/train_val/train.json -P srv/task_data/CVDN/data/
wget https://cvdn.dev/dataset/CVDN/train_val/val_seen.json -P srv/task_data/CVDN/data/
wget https://cvdn.dev/dataset/CVDN/train_val/val_unseen.json -P srv/task_data/CVDN/data/

# R4R is generated from R2R (see github.com/google-research/google-research/tree/master/r4r);
# RxR guide annotations: gs://rxr-data/ (rxr_train_guide.jsonl.gz) -> srv/task_data/RxR/data/

# --- pretrained assets (model_utils.py:36-44 downloads Oscar at run time;
# here they are fetched up front so multi-host runs need no rank barrier) ---
mkdir -p srv/oscar_weights srv/vocab srv/detector

# Oscar base-no-labels checkpoint (the VISITRON init; see Oscar MODEL_ZOO —
# github.com/microsoft/Oscar — for the canonical blob URL):
wget https://biglmdiag.blob.core.windows.net/oscar/pretrained_models/base-no-labels.zip \
    -O srv/oscar_weights/base-no-labels.zip && \
    unzip -o srv/oscar_weights/base-no-labels.zip -d srv/oscar_weights/

# bert-base-uncased WordPiece vocab (tokenizer parity):
wget https://huggingface.co/bert-base-uncased/resolve/main/vocab.txt \
    -O srv/vocab/bert-base-uncased-vocab.txt

# Visual Genome class/attribute vocabularies for the bottom-up detector
# (1600 objects + background, 400 attributes + none; bottom-up-attention repo):
wget https://raw.githubusercontent.com/peteanderson80/bottom-up-attention/master/data/genome/1600-400-20/objects_vocab.txt \
    -O srv/detector/objects_vocab.txt
wget https://raw.githubusercontent.com/peteanderson80/bottom-up-attention/master/data/genome/1600-400-20/attributes_vocab.txt \
    -O srv/detector/attributes_vocab.txt

# The VG Faster R-CNN weights ship as Caffe .caffemodel
# (resnet101_faster_rcnn_final.caffemodel, link in the bottom-up-attention
# README). Convert to an .npz of {caffe_layer: array} with any Caffe install
# and pass it as --detector_weights to `run.py extract_regions`.
echo "done"
