# Development targets (reference: Makefile bazel-test/lint pipeline).

PYTHON ?= python

.PHONY: test test-fast bench runtime lint check-all

test:
	$(PYTHON) -m pytest tests/ -q

test-fast:
	$(PYTHON) -m pytest tests/ -q -x -k "not alignment and not oracle"

bench:
	$(PYTHON) bench.py

runtime:
	$(PYTHON) -c "from envpool_tpu.runtime import build_library; print(build_library(force=True))"

lint:
	$(PYTHON) -m ruff check envpool_tpu tests bench.py __graft_entry__.py || true

check-all: lint test bench
