/* Shim for sonLib's stGraph: undirected weighted graph + Dijkstra, as
 * used by the reference spanning-tree pair selection
 * (impl/multipleAligner.c:841-885). */
#ifndef CPECAN_TPU_STGRAPH_SHIM_H
#define CPECAN_TPU_STGRAPH_SHIM_H

#include "sonLib.h"

#ifdef __cplusplus
extern "C" {
#endif

typedef struct _stGraph stGraph;

stGraph *stGraph_construct(int64_t vertexNo);
void stGraph_addEdge(stGraph *g, int64_t v1, int64_t v2, double weight);
/* Dijkstra from source; caller frees the returned length-vertexNo array.
 * Unreachable vertices get DBL_MAX. */
double *stGraph_shortestPaths(stGraph *g, int64_t source);
void stGraph_destruct(stGraph *g);

#ifdef __cplusplus
}
#endif

#endif
