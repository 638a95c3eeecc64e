/* Shim for sonLib's pairwiseAlignment.h: the cigar container used by the
 * reference's blast-anchor path (impl/pairwiseAligner.c:979-1060).  The
 * parity harness feeds anchors directly, so cigarRead/cigarWrite are
 * abort stubs; the structs match the fields the reference reads
 * (operationList->list/length, opType, length, start/end/strand). */
#ifndef CPECAN_TPU_PAIRWISE_ALIGNMENT_SHIM_H
#define CPECAN_TPU_PAIRWISE_ALIGNMENT_SHIM_H

#include "sonLib.h"

#ifdef __cplusplus
extern "C" {
#endif

#define PAIRWISE_MATCH 0
#define PAIRWISE_INDEL_X 1
#define PAIRWISE_INDEL_Y 2

struct List {
    void **list;
    int64_t length;
    int64_t maxLength;
    void (*destructElement)(void *);
};

struct AlignmentOperation {
    int64_t opType;
    int64_t length;
    float score;
};

struct PairwiseAlignment {
    char *contig1;
    int64_t start1;
    int64_t end1;
    int64_t strand1;
    char *contig2;
    int64_t start2;
    int64_t end2;
    int64_t strand2;
    float score;
    struct List *operationList;
};

struct List *constructEmptyList(int64_t length, void (*destructElement)(void *));
void listAppend(struct List *l, void *item);
void destructList(struct List *l);

struct AlignmentOperation *constructAlignmentOperation(int64_t opType,
                                                       int64_t length,
                                                       float score);
void destructAlignmentOperation(struct AlignmentOperation *op);

struct PairwiseAlignment *constructPairwiseAlignment(
        char *contig1, int64_t start1, int64_t end1, int64_t strand1,
        char *contig2, int64_t start2, int64_t end2, int64_t strand2,
        float score, struct List *operationList);
void checkPairwiseAlignment(struct PairwiseAlignment *pA);

struct PairwiseAlignment *cigarRead(FILE *fileHandle);
void cigarWrite(FILE *fileHandle, struct PairwiseAlignment *pA, int64_t asProbs);
void destructPairwiseAlignment(struct PairwiseAlignment *pA);

#ifdef __cplusplus
}
#endif

#endif
