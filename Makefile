# Test tiers. `slow` marks everything measured >=5 s on the CI box
# (single CPU, forced 8-device mesh); the fast tier is the iteration
# gate, the full suite is the pre-ship gate. pytest.ini defines the
# markers.

.PHONY: test test-all bench

test:
	python -m pytest tests/ -q -m "not slow"

test-all:
	python -m pytest tests/ -q

bench:
	python bench.py
