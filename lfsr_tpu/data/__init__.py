"""Data layer: .mat -> HDF5 generation, in-memory datasets, augmentation."""
