# Top-level build/test/bench entry points (the reference drives four C
# builds from its root Makefile; here the native helper + test + bench).

PY ?= python

.PHONY: all native test test-fast bench goldens clean

all: native

native:
	$(MAKE) -C block_lanczos_tpu/native

test:
	$(PY) -m pytest tests/ -x -q

test-fast:
	$(PY) -m pytest tests/ -x -q -m "not slow"

bench:
	$(PY) bench.py

goldens:
	$(PY) scripts/make_goldens.py

clean:
	$(MAKE) -C block_lanczos_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
