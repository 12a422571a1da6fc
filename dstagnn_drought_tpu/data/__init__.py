from dstagnn_drought_tpu.data.windowing import (  # noqa: F401
    search_data,
    get_sample_indices,
    read_and_generate_dataset,
    normalization,
    windowed_npz_path,
)
from dstagnn_drought_tpu.data.adjacency import (  # noqa: F401
    edge_list_adjacency,
    load_stag_adjacency,
    load_strg_adjacency,
    load_dense_adjacency,
)
from dstagnn_drought_tpu.data.dataset import ArrayDataset, load_windowed_dataset  # noqa: F401
