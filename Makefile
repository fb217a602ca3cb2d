# Developer entry points. The test suite forces an 8-virtual-device CPU
# backend (tests/conftest.py); bench/validation targets use the real chip.

.PHONY: test bench sweep dryrun validate-dropout native clean

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

sweep:
	python benchmarks/sweep.py

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

validate-dropout:
	python benchmarks/validate_fused_dropout.py

native:
	python -c "from imagegeneration_tpu.ops.native import build_fastimage; print(build_fastimage(verbose=True))"

clean:
	rm -rf .jax_cache imagegeneration_tpu/ops/native/build .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
