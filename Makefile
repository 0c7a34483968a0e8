# Convenience targets (tests force the local-CPU backend via tests/conftest.py)

.PHONY: test test-fast bench bench-full native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

bench-full:
	python bench_full.py

native:
	g++ -O3 -march=native -std=c++17 -fPIC -shared -pthread \
		-o native/libtpucaptioner.so native/bleu.cpp native/dataloader.cpp

clean:
	rm -rf .pytest_cache .jax_cache native/libtpucaptioner.so
	find . -name __pycache__ -type d -exec rm -rf {} +
