"""Host-side data IO: h5 readers, openpose JSON, dataset builders.

Device-side math (projection, masks, rasterization) lives in
``renderloom.ops`` — the host only reads bytes and ships raw arrays.
"""
