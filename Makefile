# Developer entry points (the reference's CMake/CTest equivalents).

PY ?= python

.PHONY: test bench bench-micro native tables vectors example clean

test:
	$(PY) -m pytest tests/ -x -q

bench:
	$(PY) bench.py

bench-micro:
	$(PY) bench_micro.py

# host-side native helper library (ctypes)
native:
	tools/build_native.sh

# regenerate codec tables + golden vectors (needs /root/reference built;
# see tools/build_reference.sh)
tables:
	$(PY) tools/gen_tables.py

vectors:
	$(PY) tools/gen_vectors.py

example:
	$(PY) examples/decode_stream.py

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
