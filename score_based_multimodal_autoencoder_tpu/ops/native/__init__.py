from .native import decode_images, gather_normalize_u8, native_available
