"""On-device primitive library (XLA/Pallas).

Every numeric routine the reference delegated to numpy/skimage/shapely/cv2
on the host lives here as a JAX op with static shapes, so it fuses under
``jit`` and shards under ``shard_map``:

- ``masking``      — RGB→HSV, Otsu, tissue masks (ref: Mussel segmentation,
                     polygon_morphology.py:100-153)
- ``gridops``      — tile grids, foreground pooling, tiles↔grid rasterize
                     (ref: tiling.py, create_and_overlay_polygon_*.py:60-137)
- ``morphology``   — binary erosion/dilation/open/close with disk SEs,
                     small-object/hole removal (ref: skimage/cv2 morphology)
- ``components``   — connected-component labeling by bounded scan-propagation
- ``contours``     — marching-squares contour extraction + simplification
- ``tme``          — exact buffered-union ROI test as rect-distance reduction
                     (ref: shapely unary_union().buffer() at
                     load_annotation_with_coordinates.py:196-222)
- ``scatter``      — probability-map splat (ref: molecular_feature_extraction
                     .py:156-190 python loop)
- ``watershed``    — hover-map Sobel + marker flooding (ref: HoverNeXt CPU
                     post-processing)
- ``neighbors``    — kNN / radius graph over nuclei centroids (ref: libpysal
                     KNN + cKDTree in hovernet_tile_inference.ipynb)
- ``jpegcolor``    — 4:2:0 chroma upsample + libjpeg fixed-point YCbCr→RGB:
                     finishes the planar half-bandwidth tile feed on device
                     (ref: the libjpeg decode inside tiffslide, SURVEY §1 L0)
"""
