# sim2real_lane_segment_tpu — convenience targets
# (reference shipped a Makefile for its docker images; here the targets
# cover the native dev loop. CPU env vars: see tests/conftest.py docs.)

CPU_ENV = PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu

.PHONY: test test-fast bench dryrun lint sim-bench serve domain-study \
        domain-study-scaled multihost

# full gate suite (slow marks included) — the pre-release bar
test:
	$(CPU_ENV) python -m pytest tests/ -x -q

# default developer/CI loop: <5 min on a warm compile cache (conftest.py
# enables a persistent XLA cache; the first cold run builds it)
test-fast:
	$(CPU_ENV) python -m pytest tests/ -x -q -m "not slow"

bench:
	python bench.py

dryrun:
	$(CPU_ENV) XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	    python -c "import jax; jax.config.update('jax_platforms','cpu'); \
	               import __graft_entry__; __graft_entry__.dryrun_multichip(8)"

sim-bench:
	python -m sim2real_lane_segment_tpu.cli.sim_benchmark

# streaming inference service over the committed demo weights
serve:
	python -m sim2real_lane_segment_tpu.cli.serve \
	    --checkpointPath artifacts/lanenet_lite_sim.msgpack --arch lite

# the full 5-regime adaptation experiment (tens of minutes on one chip)
domain-study:
	python -m sim2real_lane_segment_tpu.cli.domain_study

# the scaled study (multi-hour): FCDenseNet67, ~1.9k frames/domain,
# reference batch/lr recipe.  Crash-resumable at epoch granularity —
# the loop relaunches on transient backend deaths (shared-chip pressure)
domain-study-scaled:
	for i in $$(seq 1 40); do \
	    python -m sim2real_lane_segment_tpu.cli.domain_study \
	        --workdir domain_study_scaled --arch 67 --episodes 8 \
	        --steps 240 --epochs 100 --n_labelled 64 -b 64 --lr 1e-3 \
	        --device_cache --regimes baseline st hm mme && break; \
	    echo "[babysitter] exited rc=$$? (attempt $$i); retry in 90s" >&2; \
	    sleep 90; \
	done

# validate multi-host data parallelism with a real 2-process CPU cluster
multihost:
	$(CPU_ENV) python -m pytest tests/test_multihost.py -q
