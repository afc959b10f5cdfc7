#!/usr/bin/env python
"""AOT memory-analysis probe for the sharded fused build (judge r3 #2).

The 10M-rows/chip sharded build peaked at 17.5 GB on a 16 GB chip while
the single-device program fits — CLAUDE.md attributes the delta to "an
extra [N,96] relayout the shard_map program keeps for the cumsum". This
probe AOT-compiles build variants (no data, no execution — just the
remote compiler) and prints each program's XLA memory analysis, so
fixes can be iterated at compile cost instead of OOM-crash cost.

Usage: python benchmarks/probe_sharded_mem.py [--n 10000000] [--d 96]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def report(tag, compiled):
    ma = compiled.memory_analysis()
    gib = 1 << 30
    print(
        f"{tag}: temp={ma.temp_size_in_bytes / gib:.2f}G "
        f"args={ma.argument_size_in_bytes / gib:.2f}G "
        f"out={ma.output_size_in_bytes / gib:.2f}G "
        f"alias={ma.alias_size_in_bytes / gib:.2f}G "
        f"peak~={(ma.temp_size_in_bytes + ma.argument_size_in_bytes + ma.output_size_in_bytes - ma.alias_size_in_bytes) / gib:.2f}G",
        flush=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--d", type=int, default=96)
    ap.add_argument("--leaf", type=int, default=16)
    ap.add_argument("--subsample", type=int, default=4,
                    help="stats_subsample (the production auto policy "
                    "picks 4 above 500k rows; 1 reproduces the round-3 "
                    "sharded OOM)")
    ap.add_argument("--variants", type=str, default="single,sharded")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vector_database_tpu.ops.sorted_build import (
        _STATICS,
        _sorted_build_impl,
        id_limb_plan,
        segment_capacity,
    )

    n, d, leaf = args.n, args.d, args.leaf
    s_max = segment_capacity(n, leaf)
    m_max = 2 * n
    variants = args.variants.split(",")

    if "single" in variants:
        import functools

        fn = jax.jit(
            functools.partial(
                _sorted_build_impl,
                s_max=s_max, m_max=m_max, leaf_size=leaf,
                max_levels=n + 64, stats_subsample=args.subsample,
            ),
            donate_argnums=(0,),
        )
        lowered = fn.lower(
            jax.ShapeDtypeStruct((n, d), jnp.float32),
            jax.ShapeDtypeStruct((n,), jnp.int32),
            jax.ShapeDtypeStruct((), jnp.int32),
        )
        report("single_donate", lowered.compile())

    if "sharded" in variants:
        from vector_database_tpu.parallel import make_mesh
        from vector_database_tpu.parallel.global_tree import (
            _sharded_build_fn,
        )

        mesh = make_mesh()
        shards = mesh.shape["data"]
        n_loc = -(-n // shards)
        n_pad = n_loc * shards
        id_bits, id_limbs = 7, 5
        fn = _sharded_build_fn(
            mesh, "data", n_loc, d, s_max, m_max, leaf, n + 64,
            args.subsample, "positional", id_bits, id_limbs, True,
        )
        vsh = NamedSharding(mesh, P("data", None))
        rsh = NamedSharding(mesh, P("data"))
        lowered = fn.lower(
            jax.ShapeDtypeStruct((n_pad, d), jnp.float32, sharding=vsh),
            jax.ShapeDtypeStruct((n_pad,), jnp.int32, sharding=rsh),
            jax.ShapeDtypeStruct((shards,), jnp.int32, sharding=rsh),
        )
        report("sharded_donate", lowered.compile())


if __name__ == "__main__":
    main()
