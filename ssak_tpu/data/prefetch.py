"""Host-side input-pipeline overlap.

The device train step and the host batch producer (audio decode, resample,
augmentation, padding — data/dataset.bucketed_audio_batches) otherwise
alternate serially: the chip idles while the host builds the next batch.
A small background-thread pipeline keeps `depth` batches ready so host work
hides under device time — the tf.data-prefetch role without a framework.

TPU note: jax dispatch is async, so the main thread only blocks in the
train loop when it fetches metric VALUES; with 2-deep prefetch the host
producer runs during that window and the chip never waits for audio I/O.
"""

import queue
import threading

_END = object()


def prefetch_map(fn, items, workers: int = 2, depth: int = 8):
    """Ordered threaded map with a bounded in-flight window: yields
    fn(item) in input order while `workers` threads compute ahead (up to
    `depth` outstanding). The audio-ingest parallelizer: file decode +
    resample releases the GIL in C (wav np.frombuffer, mpg123, polyphase),
    so 2 threads roughly double files/s on this 2-CPU host."""
    from concurrent.futures import ThreadPoolExecutor

    import collections

    ex = ThreadPoolExecutor(max_workers=max(1, workers))
    try:
        dq = collections.deque()
        for item in items:
            dq.append(ex.submit(fn, item))
            if len(dq) >= depth:
                yield dq.popleft().result()
        while dq:
            yield dq.popleft().result()
    finally:
        ex.shutdown(wait=False)


def prefetch_iterator(iterator, depth: int = 2):
    """Wrap `iterator`, producing the same items in the same order, but
    computed ahead in a daemon thread with a `depth`-bounded queue.
    Exceptions in the producer re-raise at the consumption point."""
    q = queue.Queue(maxsize=max(1, depth))
    errors = []

    def worker():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as e:  # noqa: BLE001 - re-raised in consumer
            errors.append(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True, name="ssak-prefetch")
    t.start()
    while True:
        item = q.get()
        if item is _END:
            if errors:
                raise errors[0]
            return
        yield item
