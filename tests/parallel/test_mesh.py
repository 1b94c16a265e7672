import jax
import jax.numpy as jnp
import numpy as np

from segmantic_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)


def test_mesh_has_8_cpu_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "model")


def test_shard_batch_and_reduce():
    mesh = make_mesh()
    batch = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
    sharded = shard_batch(mesh, batch)
    assert sharded["x"].sharding.is_equivalent_to(
        batch_sharding(mesh, 2), ndim=2
    )

    @jax.jit
    def total(b):
        return jnp.sum(b["x"])

    assert float(total(sharded)) == float(np.arange(16).sum())


def test_replicated_params_sharded_grad():
    mesh = make_mesh()
    params = replicate(mesh, {"w": jnp.ones((4,))})
    x = shard_batch(mesh, np.ones((8, 4), np.float32))

    @jax.jit
    def loss(p, x):
        return jnp.mean((x @ p["w"]) ** 2)

    g = jax.jit(jax.grad(loss))(params, x)
    # gradient of replicated params over sharded batch: XLA inserts the psum
    np.testing.assert_allclose(np.asarray(g["w"]), 8.0 * np.ones(4), rtol=1e-5)


def test_model_axis_mesh():
    mesh = make_mesh(data=4, model=2)
    assert mesh.devices.shape == (4, 2)
