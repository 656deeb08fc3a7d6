from .native import gather_normalize_u8, native_available
