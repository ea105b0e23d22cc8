"""Classify MUTAG with a WL-subtree Gram matrix and a precomputed-kernel
SVM — the canonical graph-kernel workflow."""

import numpy as np
from sklearn.model_selection import cross_val_score
from sklearn.svm import SVC

from grakel_tpu import GraphKernel
from grakel_tpu.datasets import fetch_dataset

bunch = fetch_dataset("MUTAG")  # downloads to ~/grakel_tpu_data
K = GraphKernel(kernel={"name": "weisfeiler_lehman", "n_iter": 5},
                normalize=True).fit_transform(bunch.data)
scores = cross_val_score(SVC(kernel="precomputed", C=10.0), K,
                         bunch.target, cv=10)
print("WL h=5 on MUTAG: %.3f +- %.3f" % (scores.mean(), scores.std()))
