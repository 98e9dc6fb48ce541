"""Inference server IPC tests: batching, partial-work splitting, retry."""

import threading
import time

import numpy as np
import pytest

from mapperatorinator_tpu.infer.server import RETRY_SIGNAL, InferenceClient, InferenceServer


def make_fake_generate(batch_sizes_seen, fail_first=False):
    state = {"calls": 0}

    def generate_fn(model_kwargs, generate_kwargs):
        state["calls"] += 1
        if fail_first and state["calls"] == 1:
            raise RuntimeError("boom")
        frames = model_kwargs["frames"]
        batch_sizes_seen.append(frames.shape[0])
        ids = model_kwargs["decoder_input_ids"]
        # echo: output = ids + 1, plus 2 generated columns of value 7
        out = np.concatenate([ids + 1, np.full((ids.shape[0], 2), 7, ids.dtype)], axis=1)
        stats = {
            "generated_tokens_per_sample": [2] * frames.shape[0],
            "elapsed_seconds": 0.01,
        }
        return out, stats

    return generate_fn


@pytest.fixture
def socket_path(tmp_path):
    return str(tmp_path / "test.sock")


def test_server_roundtrip(socket_path):
    seen = []
    server = InferenceServer(make_fake_generate(seen), max_batch_size=8, batch_timeout=0.05,
                             idle_timeout=60, socket_path=socket_path)
    server.start()
    try:
        client = InferenceClient(socket_path=socket_path)
        model_kwargs = {
            "frames": np.zeros((2, 16), np.float32),
            "decoder_input_ids": np.array([[1, 2], [3, 4]], np.int32),
        }
        out = client.generate(model_kwargs, {"temperature": 1.0})
        np.testing.assert_array_equal(out, [[2, 3, 7, 7], [4, 5, 7, 7]])
        assert client.last_generation_stats["generated_tokens"] == 4
        client.close()
    finally:
        server.stop()


def test_server_splits_oversized_requests(socket_path):
    """A request larger than max_batch_size is processed in chunks and
    reassembled (reference: server.py:350-409)."""
    seen = []
    server = InferenceServer(make_fake_generate(seen), max_batch_size=2, batch_timeout=0.05,
                             idle_timeout=60, socket_path=socket_path)
    server.start()
    try:
        client = InferenceClient(socket_path=socket_path)
        n = 5
        model_kwargs = {
            "frames": np.zeros((n, 16), np.float32),
            "decoder_input_ids": np.arange(n * 2, dtype=np.int32).reshape(n, 2),
        }
        out = client.generate(model_kwargs, {"temperature": 1.0})
        assert out.shape[0] == n
        np.testing.assert_array_equal(out[:, :2], model_kwargs["decoder_input_ids"] + 1)
        assert max(seen) <= 2
        assert sum(seen) == n
        client.close()
    finally:
        server.stop()


def test_server_batches_multiple_clients(socket_path):
    seen = []
    server = InferenceServer(make_fake_generate(seen), max_batch_size=8, batch_timeout=0.1,
                             idle_timeout=60, socket_path=socket_path)
    server.start()
    try:
        results = {}

        def worker(i):
            client = InferenceClient(socket_path=socket_path)
            model_kwargs = {
                "frames": np.zeros((1, 16), np.float32),
                "decoder_input_ids": np.array([[i, i]], np.int32),
            }
            results[i] = client.generate(model_kwargs, {"temperature": 1.0})
            client.close()

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=20)
        assert len(results) == 4
        for i in range(4):
            np.testing.assert_array_equal(results[i][0, :2], [i + 1, i + 1])
        # at least one merged batch occurred (4 singleton requests, <=8 slots)
        assert max(seen) >= 2
        client_batches = sum(seen)
        assert client_batches == 4
    finally:
        server.stop()


def test_server_retry_on_error(socket_path):
    seen = []
    server = InferenceServer(make_fake_generate(seen, fail_first=True), max_batch_size=8,
                             batch_timeout=0.05, idle_timeout=60, socket_path=socket_path)
    server.start()
    try:
        client = InferenceClient(socket_path=socket_path)
        model_kwargs = {
            "frames": np.zeros((1, 16), np.float32),
            "decoder_input_ids": np.array([[9, 9]], np.int32),
        }
        out = client.generate(model_kwargs, {"temperature": 1.0})
        np.testing.assert_array_equal(out, [[10, 10, 7, 7]])
        client.close()
    finally:
        server.stop()
