.PHONY: test native bench bench-infer clean

test:
	python -m pytest tests -q

native:
	$(MAKE) -C native

bench: native
	python bench.py

bench-infer: native
	python bench_infer.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
