.PHONY: test native bench dryrun clean

test:
	python -m pytest tests/ -q

dryrun:  # multichip sharding validation on 8 virtual CPU devices
	XLA_FLAGS=--xla_force_host_platform_device_count=8 python -c \
	  "import jax; jax.config.update('jax_platforms','cpu'); \
	   import __graft_entry__ as g; g.dryrun_multichip(8)"

native:
	$(MAKE) -C native

bench:
	python bench.py

clean:
	$(MAKE) -C native clean
	rm -rf .pytest_cache
