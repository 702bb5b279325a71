#!/bin/bash
# Post-outage TPU revalidation (round 3): run after the axon tunnel
# returns. Probes first; each step prints its JSON/status on its own
# line. Sequential on purpose — concurrent jobs serialize through the
# tunnel and blow their timeouts.
set -u
cd "$(dirname "$0")/.."

echo "== probe"
timeout 60 python -u -c "import jax; print(jax.devices())" || {
    echo "TUNNEL STILL DOWN"; exit 1; }

echo "== bench: LA self-train step"
timeout 1200 python bench.py

echo "== bench: LA remat step (expected slower; quotes the HBM trade)"
timeout 1800 python bench.py --remat

echo "== bench: eval"
timeout 1200 python bench.py --eval

echo "== bench: acdc + pancreas variants"
timeout 1800 python bench.py --variant acdc
timeout 1800 python bench.py --variant pancreas

echo "== TPU-gated pallas exactness tests (BCP_TEST_TPU keeps the real backend)"
timeout 1800 env BCP_TEST_TPU=1 python -m pytest \
  tests/test_conv3d.py tests/test_scatter_pallas.py -q

echo "== verify drive: train + eval CLI on synthetic data"
rm -rf /tmp/v_la /tmp/v_snap
python -c "from bcp_tpu.data import synthetic; \
  synthetic.make_la_dataset('/tmp/v_la', n_train=10, n_test=2, shape=(140,140,90))"
timeout 1800 python -m bcp_tpu.cli.train_la --root_path /tmp/v_la --labelnum 4 \
  --max_samples 10 --pre_max_iteration 4 --self_max_iteration 4 \
  --snapshot_root /tmp/v_snap 2>&1 | grep -vE WARNING | tail -5
timeout 900 python -m bcp_tpu.cli.test_la --root_path /tmp/v_la --labelnum 4 \
  --snapshot_root /tmp/v_snap --nms 1 --detail 1 2>&1 | grep -vE WARNING | tail -5
echo "== done"
