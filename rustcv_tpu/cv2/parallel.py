"""cv2.parallel role: backend selection is a no-op — host-side
parallelism lives in the native worker pools (setNumThreads) and
device-side in XLA."""


def setParallelForBackend(backendName, propagateNumThreads=True):
    return True
