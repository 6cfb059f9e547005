# Development targets (reference: Makefile bazel-test/lint pipeline).

PYTHON ?= python
# Test sharding: `make test` runs the suite in SHARDS parallel pytest
# processes (keeps wall-clock under the 12-minute budget; the heavy
# families — jumanji, highway, minigrid — dominate a serial run).
SHARDS ?= 5

.PHONY: test test-serial test-fast bench runtime lint wheel wheel-smoke check-all

test:
	$(PYTHON) tools/run_sharded_tests.py --shards $(SHARDS)

test-serial:
	$(PYTHON) -m pytest tests/ -q

test-fast:
	$(PYTHON) -m pytest tests/ -q -x -k "not alignment and not oracle"

bench:
	$(PYTHON) bench.py

runtime:
	$(PYTHON) -c "from envpool_tpu.runtime import build_library; print(build_library(force=True))"

# Lint MUST fail on findings.  ruff when installed; always the stdlib
# syntax gate (compileall) so the target is never a no-op.
lint:
	$(PYTHON) -m compileall -q envpool_tpu tests tools bench.py __graft_entry__.py
	@if $(PYTHON) -c "import ruff" 2>/dev/null; then \
		$(PYTHON) -m ruff check envpool_tpu tests bench.py __graft_entry__.py; \
	else \
		echo "ruff not installed; compileall gate only"; \
	fi

wheel:
	$(PYTHON) -m pip wheel . --no-deps -w dist --no-build-isolation

wheel-smoke:
	$(PYTHON) tools/wheel_smoke.py

check-all: lint test bench
