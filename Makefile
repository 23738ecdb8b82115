# Test entry points (VERDICT r3 #8).
# test-fast: default subset (slow-marked tests deselected via pyproject
#            addopts), green in ~7 min on the 2-CPU reference host.
# test-full: the whole suite incl. multi-process/sharded oracles (~18 min).
PY ?= python

.PHONY: test test-fast test-full bench
test: test-fast
test-fast:
	$(PY) -m pytest tests/ -x -q
test-full:
	$(PY) -m pytest tests/ -x -q -m ''
bench:
	$(PY) bench.py
