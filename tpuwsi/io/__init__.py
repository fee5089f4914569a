from tpuwsi.io.cohorts import (
    DatasetGroup,
    get_dataset_batch_num,
    get_dataset_group,
    get_datasets_dir_dict,
    slides_data_file,
)
from tpuwsi.io.levels import get_optimal_slide_level
from tpuwsi.io.grids import (
    build_tissue_grid,
    grid_data_columns,
    grid_file_path,
    load_grid_packed,
    load_grid_pickle,
    save_grid_packed,
    save_grid_pickle,
)
from tpuwsi.io.slide_readers import (
    ImageSlideReader,
    SlideReader,
    SyntheticSlideReader,
    open_slide,
)
from tpuwsi.io.tiles import TileStats, choose_data, choose_locations, get_tiles
from tpuwsi.io.metadata import SlideTable, load_slide_table
from tpuwsi.io.folder import ImageFolderDataset
from tpuwsi.io.wsi import Prefetcher, WSITileSampler

__all__ = [
    "DatasetGroup",
    "get_dataset_batch_num",
    "get_dataset_group",
    "get_datasets_dir_dict",
    "slides_data_file",
    "get_optimal_slide_level",
    "build_tissue_grid",
    "grid_data_columns",
    "grid_file_path",
    "load_grid_packed",
    "load_grid_pickle",
    "save_grid_packed",
    "save_grid_pickle",
    "ImageSlideReader",
    "SlideReader",
    "SyntheticSlideReader",
    "open_slide",
    "TileStats",
    "choose_data",
    "choose_locations",
    "get_tiles",
    "SlideTable",
    "load_slide_table",
    "ImageFolderDataset",
    "Prefetcher",
    "WSITileSampler",
]
