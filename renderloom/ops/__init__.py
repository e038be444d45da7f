"""On-device ops: pose geometry, rasterizers, image ops, flow, spectral norm."""
