"""Datasets, host loaders, ETL, and on-device augmentation."""
