from dlmc_quant_tpu.data.loaders import (  # noqa: F401
    DATALOADERS,
    ArrayDataset,
    DataLoader,
    get_dataloader,
)
