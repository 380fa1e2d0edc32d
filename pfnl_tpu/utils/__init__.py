from pfnl_tpu.utils.image_io import imread, imsave, to_uint8_img, automkdir

__all__ = ["imread", "imsave", "to_uint8_img", "automkdir"]
