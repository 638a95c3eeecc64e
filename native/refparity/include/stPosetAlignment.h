/* Shim for sonLib's stPosetAlignment: the partial-order consistency
 * filter used by the reference MSA (impl/multipleAligner.c:276,284).
 * Re-implemented from the call-site semantics: positions within a
 * sequence are totally ordered; stPosetAlignment_add(s1,p1,s2,p2)
 * succeeds iff placing (s1,p1) and (s2,p2) in the same alignment
 * column keeps the induced order on columns acyclic (rejecting
 * crossing/cyclic pairs), and commits the alignment when it does. */
#ifndef CPECAN_TPU_STPOSETALIGNMENT_SHIM_H
#define CPECAN_TPU_STPOSETALIGNMENT_SHIM_H

#include "sonLib.h"

#ifdef __cplusplus
extern "C" {
#endif

typedef struct _stPosetAlignment stPosetAlignment;

stPosetAlignment *stPosetAlignment_construct(int64_t sequenceNumber);
bool stPosetAlignment_add(stPosetAlignment *p, int64_t seq1, int64_t pos1,
                          int64_t seq2, int64_t pos2);
bool stPosetAlignment_isPossible(stPosetAlignment *p, int64_t seq1,
                                 int64_t pos1, int64_t seq2, int64_t pos2);
void stPosetAlignment_destruct(stPosetAlignment *p);

#ifdef __cplusplus
}
#endif

#endif
