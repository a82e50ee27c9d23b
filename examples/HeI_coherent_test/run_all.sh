#!/bin/bash
# Generate + run the full HeI coherent/incoherent matrix
# (reference examples/HeI_coherent_test/run_all.sh).
set -e
python generate_inputs.py
for f in pt_tau*.in un_tau*.in; do
    echo "=== $f"
    python -m lart_tpu "$f"
done
