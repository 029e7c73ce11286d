"""Host data layer: VoxCeleb tree datasets + prefetching loader."""

from .datasets import (CustomDataset, CustomDatasetTestsetSynthetic,
                       CustomDatasetTestsetReal, CustomDatasetPaired,
                       CustomDatasetPairedValidation, DatasetInversion,
                       Loader, load_image_gan_range)
