from lanetpu.utils.timing import device_sync, time_fn

__all__ = ["device_sync", "time_fn"]
