from opticalflowclustering_tpu.cluster.kmeans import (
    kmeans,
    kmeans_batched,
    minibatch_kmeans,
)
from opticalflowclustering_tpu.cluster.matcher import (
    cosine_similarity_matrix,
    match_signature,
    sliding_cosine_similarity,
)
