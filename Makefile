# Dev-loop entry points. `make test` is THE one-command full suite — see
# scripts/test.sh for why it shards the run into pytest processes.
.PHONY: test test-fast bench

test:
	bash scripts/test.sh

test-fast:  ## -x within each chunk AND stop at the first failing chunk
	TEST_SH_FAIL_FAST=1 bash scripts/test.sh 2 -x

bench:
	python bench.py
