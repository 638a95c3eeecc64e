/* Shim for sonLib's bioioC.h: fasta/tempfile helpers referenced by the
 * blast-anchor path only (impl/pairwiseAligner.c:975,1022).  The parity
 * harness keeps problems below the anchor threshold or passes anchors
 * explicitly, so these are abort stubs. */
#ifndef CPECAN_TPU_BIOIO_SHIM_H
#define CPECAN_TPU_BIOIO_SHIM_H

#include "sonLib.h"

#ifdef __cplusplus
extern "C" {
#endif

void fastaWrite(char *sequence, char *header, FILE *file);
char *getTempFile(void);
void fastaReadToFunction(FILE *fastaFile,
                         void (*fn)(const char *header, const char *sequence,
                                    int64_t length));

#ifdef __cplusplus
}
#endif

#endif
