PY ?= python

.PHONY: test test-all bench smoke mms bp1 flower validate clean

test:
	$(PY) -m pytest tests/ -x -q

test-all:
	HYBRIDSBP_SLOW_TESTS=1 $(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

smoke:
	$(PY) drivers/single_block.py
	$(PY) drivers/check_residual.py

mms:
	$(PY) drivers/square_circle.py --p 2 --N0 8 --levels 3

bp1:
	HYBRIDSBP_PLATFORM=cpu $(PY) drivers/bp1.py --years 1000 --N 200

flower:
	$(PY) drivers/flower.py

validate:
	$(PY) drivers/local_op_eigenvalues.py --samples 100
	$(PY) drivers/global_op_eigenvalues.py --samples 50

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
	rm -rf .pytest_cache build dist *.egg-info
