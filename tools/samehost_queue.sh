#!/bin/sh
# Same-host reference baselines (VERDICT r4 #4): one cell per kernel —
# the biggest cell per kernel the reference can plausibly finish inside
# the budget — measured on THIS host with the SAME synthetic data the
# bench uses.  Run ONLY with the TPU bench idle (both contend for the
# 2 CPU cores).  Results merge into docs/ref_samehost.json.
set -x
B=${1:-1800}
for cell in \
    VH/NCI1 SP/NCI1 NH/NCI1 PK/NCI1 PM/ENZYMES ODD-STh/ENZYMES \
    GR/IMDB-B SVM-theta/IMDB-B RW/MUTAG GH/MUTAG SM/MUTAG ML/MUTAG \
    WL-SP/ENZYMES NSPDK/ENZYMES WL-PM/MUTAG CORE-SP/ENZYMES \
    ODD-STh/REDDIT-M-12K; do
    timeout $((B + 300)) python tools/measure_ref_cell.py \
        --cell "$cell" --budget "$B"
done
