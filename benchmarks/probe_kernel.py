import sys, os; sys.path.insert(0, "/root/repo")
import sys, time, json
import numpy as np
import jax, jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
variants = eval(sys.argv[2]) if len(sys.argv) > 2 else [(8192, 256, 4096)]
D, Q, K, REPS = 96, 1024, 10, 20
QR = 256
print("device:", jax.devices()[0])

c = max(64, N // 1000)
key = jax.random.PRNGKey(0)
centers = jax.random.uniform(key, (c, D), jnp.float32) * 2 - 1
assign = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, c)
train = centers[assign] + 0.05 * jax.random.normal(jax.random.PRNGKey(2), (N, D), jnp.float32)
test = centers[jax.random.randint(jax.random.PRNGKey(3), (Q,), 0, c)] + \
    0.05 * jax.random.normal(jax.random.PRNGKey(4), (Q, D), jnp.float32)
train = jax.device_put(train); test = jax.device_put(test)

from vector_database_tpu import exact_knn
from vector_database_tpu.ops.pallas_knn import pack_database, pallas_scan_knn_packed
truth, _ = exact_knn(train, test[:QR], k=K)
truth = np.asarray(truth)
print("truth ready")

def recall(rows):
    rows = np.asarray(rows)
    return sum(len(set(rows[i].tolist()) & set(truth[i].tolist())) for i in range(QR)) / (QR * K)

for var in variants:
    (block, q_tile, buckets), dtype = var[:3], (var[3] if len(var) > 3 else "int8")
    pack = pack_database(train, block=block, buckets=buckets, dtype=dtype)
    fn = lambda p, qs: pallas_scan_knn_packed(p, qs, k=K, q_tile=q_tile)
    t0 = time.time()
    rows, d2 = fn(pack, test)
    r = recall(rows)
    t_compile = time.time() - t0
    qstack = jnp.broadcast_to(test, (REPS, Q, D))
    @jax.jit
    def chained(pack, qstack):
        def body(carry, qs):
            rows, d2 = fn(pack, qs)
            return carry + jnp.sum(rows), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), qstack)
        return acc
    int(chained(pack, qstack))
    t0 = time.time()
    int(chained(pack, qstack))
    qps = Q * REPS / (time.time() - t0)
    print(json.dumps({"block": block, "q_tile": q_tile, "buckets": buckets, "dtype": dtype,
                      "recall": round(r, 4), "qps": round(qps), "compile_s": round(t_compile, 1),
                      "ms_per_1024q": round(1000 * Q / qps, 2)}))
