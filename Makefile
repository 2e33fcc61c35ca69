# Developer entry points (the reference's Makefile:3-4 ran pytest via a
# helper script; same contract here, plus bench and examples).

.PHONY: test test-all bench examples lint

test:
	python -m pytest tests/ -q

test-all:
	python -m pytest tests/ -q -m "slow or not slow"

bench:
	python bench.py

examples:
	python examples/lotka_volterra.py --cpu --steps 40
	python examples/cartpole.py --cpu --steps 40
	python examples/quadrotor.py --cpu --batch 64 --H 30

lint:
	python -m pyflakes pyneuralempc_tpu tests examples || true
