# Convenience targets (see CLAUDE.md for environment notes)

.PHONY: test test-tpu bench bench-all native clean

test:
	python -m pytest tests/ -q

test-tpu:
	RUSTCV_TEST_TPU=1 python -m pytest tests/ -q

bench:
	python bench.py

bench-all:
	python bench_models.py --ticks 30

native:
	rm -f rustcv_tpu/native/librustcv_capture.so
	python -c "from rustcv_tpu import native; assert native.available(), native.build_error(); print('native lib built')"

clean:
	rm -f rustcv_tpu/native/*.so
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
