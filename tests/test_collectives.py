"""Multi-host collective helpers: exercise the non-no-op branches with a
mocked process topology (this machine is single-process; the real
`process_allgather` path only runs on a pod).

Covers the TPU-native replacements for the reference's pickle-based
all_gather of BLEU corpora (trainMultiGPU.py:110-131) and the early-stop
counter broadcast (trainMultiGPU.py:325-327).
"""

import numpy as np
import pytest

import jax

from tpu_captioner.parallel import collectives


@pytest.fixture()
def fake_two_processes(monkeypatch):
    """Pretend to be process 1 of 2; process_allgather is simulated by
    stacking per-process payloads the way jax.experimental.multihost_utils
    does (leading process axis, process order)."""
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)

    other = {}  # what "process 0" would have passed in

    def fake_allgather(tree, tiled=False):
        assert not tiled
        return jax.tree_util.tree_map(
            lambda mine: np.stack([other["tree_map"](mine), mine]), tree
        )

    from jax.experimental import multihost_utils as mh

    monkeypatch.setattr(mh, "process_allgather", fake_allgather)
    return other


def test_gather_eval_outputs_orders_processes(fake_two_processes):
    # Process 0's payload = ours + 100 (injected via the fixture hook).
    fake_two_processes["tree_map"] = lambda mine: mine + 100

    B, T, cpi = 3, 5, 2
    seqs = np.arange(B * T, dtype=np.int32).reshape(B, T)
    lens = np.array([5, 3, 4], np.int32)
    refs = np.arange(B * cpi * T, dtype=np.int32).reshape(B, cpi, T)
    valid = np.array([1, 1, 0], np.int32)

    g_seqs, g_lens, g_refs, g_valid = collectives.gather_eval_outputs(
        seqs, lens, refs, valid
    )
    # 2 processes x B rows, process 0 first.
    assert g_seqs.shape == (2 * B, T)
    assert g_refs.shape == (2 * B, cpi, T)
    np.testing.assert_array_equal(g_seqs[:B], seqs + 100)
    np.testing.assert_array_equal(g_seqs[B:], seqs)
    np.testing.assert_array_equal(g_lens, np.concatenate([lens + 100, lens]))
    np.testing.assert_array_equal(g_valid[B:], valid)


def test_gather_eval_outputs_single_process_noop():
    seqs = np.zeros((2, 4), np.int32)
    lens = np.ones((2,), np.int32)
    refs = np.zeros((2, 5, 4), np.int32)
    valid = np.ones((2,), np.int32)
    out = collectives.gather_eval_outputs(seqs, lens, refs, valid)
    for got, want in zip(out, (seqs, lens, refs, valid)):
        assert got is want  # no copies on the single-host fast path


def test_host_local_rows_and_indices_agree():
    """host_local_rows(arr)[j] must equal arr[host_local_row_indices(arr)[j]]
    on a real sharded array — the invariant the eval loop relies on to pair
    replicated outputs with sharded inputs."""
    import jax.numpy as jnp

    from tpu_captioner.data.loader import batch_sharding
    from tpu_captioner.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    sharding = batch_sharding(mesh)
    host = np.arange(16 * 3, dtype=np.int32).reshape(16, 3)
    arr = jax.make_array_from_process_local_data(sharding, host)
    rows = collectives.host_local_rows(arr)
    idx = collectives.host_local_row_indices(arr)
    np.testing.assert_array_equal(rows, host[idx])
    # Single-process: every global row appears exactly once.
    np.testing.assert_array_equal(np.sort(idx), np.arange(16))

    # Unsharded single-device arrays degrade to the identity.
    plain = jax.device_put(jnp.asarray(host))
    np.testing.assert_array_equal(collectives.host_local_rows(plain), host)
    np.testing.assert_array_equal(
        collectives.host_local_row_indices(plain), np.arange(16)
    )


def test_broadcast_scalar_takes_process_zero_value(monkeypatch):
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    from jax.experimental import multihost_utils as mh

    # broadcast_one_to_all returns process 0's value everywhere.
    monkeypatch.setattr(mh, "broadcast_one_to_all", lambda x: np.asarray(7.0))
    assert collectives.broadcast_scalar(3.0) == 7.0
    assert isinstance(collectives.broadcast_scalar(3.0), float)


def test_broadcast_scalar_single_process_noop():
    assert collectives.broadcast_scalar(11.5) == 11.5


def test_is_coordinator(monkeypatch):
    assert collectives.is_coordinator()
    monkeypatch.setattr(jax, "process_index", lambda: 3)
    assert not collectives.is_coordinator()


def test_maybe_initialize_distributed_no_coordinator(monkeypatch):
    """Without coordinator env vars this must NOT call
    jax.distributed.initialize (which would hang waiting for peers)."""
    from tpu_captioner.parallel import mesh as mesh_mod

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    called = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda *a, **k: called.append(1)
    )
    mesh_mod.maybe_initialize_distributed()
    assert not called

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:1234")
    mesh_mod.maybe_initialize_distributed()
    assert called
