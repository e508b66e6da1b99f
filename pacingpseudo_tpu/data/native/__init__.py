from .loader import NativeBatchLoader, native_available, load_batch_native
