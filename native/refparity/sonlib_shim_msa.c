/* sonLib-shim extensions needed to compile the reference MSA layer and
 * realign CLI UNMODIFIED (impl/multipleAligner.c, cPecanRealign.c) for
 * the parity harness (tests/test_ref_parity.py).
 *
 * Like sonlib_shim.c this is NOT sonLib: every structure is implemented
 * from the call sites' semantics — chained-bucket hash/set, array-backed
 * adjacency for the poset filter, Dijkstra for stGraph, exonerate-style
 * cigar text I/O matching cpecan_tpu/io/cigar.py.
 */
#include "sonLib.h"
#include "pairwiseAlignment.h"
#include "bioioC.h"
#include "stPosetAlignment.h"
#include "stGraph.h"

#include <ctype.h>
#include <float.h>

/* =========================== stHash =========================== */

typedef struct _stHashEntry {
    void *key;
    void *value;
    struct _stHashEntry *next;
} stHashEntry;

struct _stHash {
    stHashEntry **buckets;
    int64_t nBuckets;
    int64_t size;
    uint64_t (*hashFn)(const void *);
    int (*equalsFn)(const void *, const void *);
    void (*destructKeys)(void *);
    void (*destructValues)(void *);
};

static uint64_t hash_pointer(const void *k) {
    uint64_t h = (uint64_t)(uintptr_t)k;
    h ^= h >> 33;
    h *= 0xFF51AFD7ED558CCDull;
    h ^= h >> 33;
    return h;
}

static int equals_pointer(const void *a, const void *b) {
    return a == b;
}

stHash *stHash_construct3(uint64_t (*hashFn)(const void *),
                          int (*equalsFn)(const void *, const void *),
                          void (*destructKeys)(void *),
                          void (*destructValues)(void *)) {
    stHash *h = st_calloc(1, sizeof(stHash));
    h->nBuckets = 64;
    h->buckets = st_calloc(h->nBuckets, sizeof(stHashEntry *));
    h->hashFn = hashFn != NULL ? hashFn : hash_pointer;
    h->equalsFn = equalsFn != NULL ? equalsFn : equals_pointer;
    h->destructKeys = destructKeys;
    h->destructValues = destructValues;
    return h;
}

stHash *stHash_construct2(void (*destructKeys)(void *),
                          void (*destructValues)(void *)) {
    /* sonLib: construct2 = pointer-keyed hash with destructors. */
    return stHash_construct3(NULL, NULL, destructKeys, destructValues);
}

static stHashEntry **hash_find_slot(stHash *h, void *key) {
    uint64_t b = h->hashFn(key) % (uint64_t)h->nBuckets;
    stHashEntry **p = &h->buckets[b];
    while (*p != NULL && !h->equalsFn((*p)->key, key)) {
        p = &(*p)->next;
    }
    return p;
}

static void hash_resize(stHash *h) {
    int64_t newN = h->nBuckets * 4;
    stHashEntry **newB = st_calloc(newN, sizeof(stHashEntry *));
    for (int64_t i = 0; i < h->nBuckets; i++) {
        stHashEntry *e = h->buckets[i];
        while (e != NULL) {
            stHashEntry *next = e->next;
            uint64_t b = h->hashFn(e->key) % (uint64_t)newN;
            e->next = newB[b];
            newB[b] = e;
            e = next;
        }
    }
    free(h->buckets);
    h->buckets = newB;
    h->nBuckets = newN;
}

void stHash_insert(stHash *h, void *key, void *value) {
    stHashEntry **p = hash_find_slot(h, key);
    if (*p != NULL) {
        (*p)->key = key;
        (*p)->value = value;
        return;
    }
    stHashEntry *e = st_malloc(sizeof(stHashEntry));
    e->key = key;
    e->value = value;
    e->next = NULL;
    *p = e;
    if (++h->size > h->nBuckets * 2) {
        hash_resize(h);
    }
}

void *stHash_search(stHash *h, void *key) {
    stHashEntry *e = *hash_find_slot(h, key);
    return e != NULL ? e->value : NULL;
}

void *stHash_remove(stHash *h, void *key) {
    stHashEntry **p = hash_find_slot(h, key);
    stHashEntry *e = *p;
    if (e == NULL) {
        return NULL;
    }
    void *value = e->value;
    *p = e->next;
    free(e);
    h->size--;
    return value;
}

void *stHash_removeAndFreeKey(stHash *h, void *key) {
    stHashEntry **p = hash_find_slot(h, key);
    stHashEntry *e = *p;
    if (e == NULL) {
        return NULL;
    }
    void *value = e->value;
    if (h->destructKeys != NULL) {
        h->destructKeys(e->key);
    } else {
        free(e->key);
    }
    *p = e->next;
    free(e);
    h->size--;
    return value;
}

struct _stHashIterator {
    stHash *h;
    int64_t bucket;
    stHashEntry *entry;
};

stHashIterator *stHash_getIterator(stHash *h) {
    stHashIterator *it = st_calloc(1, sizeof(stHashIterator));
    it->h = h;
    it->bucket = -1;
    it->entry = NULL;
    return it;
}

void *stHash_getNext(stHashIterator *it) {
    if (it->entry != NULL) {
        it->entry = it->entry->next;
    }
    while (it->entry == NULL) {
        if (++it->bucket >= it->h->nBuckets) {
            return NULL;
        }
        it->entry = it->h->buckets[it->bucket];
    }
    return it->entry->key;
}

void stHash_destructIterator(stHashIterator *it) {
    free(it);
}

void stHash_destruct(stHash *h) {
    for (int64_t i = 0; i < h->nBuckets; i++) {
        stHashEntry *e = h->buckets[i];
        while (e != NULL) {
            stHashEntry *next = e->next;
            if (h->destructKeys != NULL) {
                h->destructKeys(e->key);
            }
            if (h->destructValues != NULL) {
                h->destructValues(e->value);
            }
            free(e);
            e = next;
        }
    }
    free(h->buckets);
    free(h);
}

uint64_t stHash_stringKey(const void *k) {
    /* djb2 */
    uint64_t hash = 5381;
    for (const char *s = k; *s; s++) {
        hash = hash * 33 + (uint64_t)(unsigned char)*s;
    }
    return hash;
}

int stHash_stringEqualKey(const void *key1, const void *key2) {
    return strcmp(key1, key2) == 0;
}

/* =========================== stSet =========================== */
/* Element-keyed wrapper over the same machinery: value == key. */

struct _stSet {
    stHash *h;
    void (*destructFn)(void *);
};

stSet *stSet_construct3(uint64_t (*hashFn)(const void *),
                        int (*equalsFn)(const void *, const void *),
                        void (*destructFn)(void *)) {
    stSet *s = st_malloc(sizeof(stSet));
    s->h = stHash_construct3(hashFn, equalsFn, NULL, NULL);
    s->destructFn = destructFn;
    return s;
}

void stSet_insert(stSet *s, void *v) {
    stHash_insert(s->h, v, v);
}

void *stSet_search(stSet *s, void *v) {
    stHashEntry *e = *hash_find_slot(s->h, v);
    return e != NULL ? e->key : NULL;
}

void *stSet_remove(stSet *s, void *v) {
    stHashEntry **p = hash_find_slot(s->h, v);
    stHashEntry *e = *p;
    if (e == NULL) {
        return NULL;
    }
    void *member = e->key;
    *p = e->next;
    free(e);
    s->h->size--;
    return member;
}

struct _stSetIterator {
    stHashIterator *it;
};

stSetIterator *stSet_getIterator(stSet *s) {
    stSetIterator *it = st_malloc(sizeof(stSetIterator));
    it->it = stHash_getIterator(s->h);
    return it;
}

void *stSet_getNext(stSetIterator *it) {
    return stHash_getNext(it->it);
}

void stSet_destructIterator(stSetIterator *it) {
    stHash_destructIterator(it->it);
    free(it);
}

void stSet_destruct(stSet *s) {
    if (s->destructFn != NULL) {
        stSetIterator *it = stSet_getIterator(s);
        void *v;
        while ((v = stSet_getNext(it)) != NULL) {
            s->destructFn(v);
        }
        stSet_destructIterator(it);
    }
    stHash_destruct(s->h);
    free(s);
}

/* ====================== stPosetAlignment ====================== */
/* Aligned pairs merge positions into columns (union-find); positions
 * within a sequence are totally ordered, inducing strict edges between
 * the columns their members sit in.  A new pair is consistent iff
 * merging the two columns creates no directed cycle, i.e. neither
 * column strictly precedes the other.  Reachability is checked by BFS
 * using, per member (seq, pos), only the column of the NEXT tracked
 * position on that sequence (transitivity covers the rest). */

typedef struct {
    int64_t *positions; /* sorted tracked positions on this sequence */
    int64_t *nodes;     /* node id per tracked position */
    int64_t n, cap;
} PosetSeq;

struct _stPosetAlignment {
    int64_t seqNo;
    PosetSeq *seqs;
    /* union-find over nodes; each node is one tracked (seq,pos). */
    int64_t *parent;
    int64_t nNodes, nodeCap;
    /* members per root: singly-linked lists into the member arrays. */
    int64_t *memberSeq;  /* node id -> seq */
    int64_t *memberPos;  /* node id -> pos */
    int64_t *nextMember; /* node id -> next node in same column, or -1 */
    int64_t *lastMember; /* root id -> tail of member list (valid at roots) */
};

stPosetAlignment *stPosetAlignment_construct(int64_t sequenceNumber) {
    stPosetAlignment *p = st_calloc(1, sizeof(stPosetAlignment));
    p->seqNo = sequenceNumber;
    p->seqs = st_calloc(sequenceNumber, sizeof(PosetSeq));
    return p;
}

static int64_t poset_find(stPosetAlignment *p, int64_t x) {
    while (p->parent[x] != x) {
        p->parent[x] = p->parent[p->parent[x]];
        x = p->parent[x];
    }
    return x;
}

/* index of first tracked position >= pos on seq s */
static int64_t poset_seq_lower(PosetSeq *s, int64_t pos) {
    int64_t lo = 0, hi = s->n;
    while (lo < hi) {
        int64_t mid = (lo + hi) / 2;
        if (s->positions[mid] < pos) {
            lo = mid + 1;
        } else {
            hi = mid;
        }
    }
    return lo;
}

static int64_t poset_get_or_create_node(stPosetAlignment *p, int64_t seq,
                                        int64_t pos) {
    PosetSeq *s = &p->seqs[seq];
    int64_t i = poset_seq_lower(s, pos);
    if (i < s->n && s->positions[i] == pos) {
        return s->nodes[i];
    }
    /* new node */
    if (p->nNodes == p->nodeCap) {
        p->nodeCap = p->nodeCap < 16 ? 16 : p->nodeCap * 2;
        p->parent = realloc(p->parent, (size_t)p->nodeCap * sizeof(int64_t));
        p->memberSeq = realloc(p->memberSeq, (size_t)p->nodeCap * sizeof(int64_t));
        p->memberPos = realloc(p->memberPos, (size_t)p->nodeCap * sizeof(int64_t));
        p->nextMember = realloc(p->nextMember, (size_t)p->nodeCap * sizeof(int64_t));
        p->lastMember = realloc(p->lastMember, (size_t)p->nodeCap * sizeof(int64_t));
        if (p->parent == NULL || p->memberSeq == NULL || p->memberPos == NULL
            || p->nextMember == NULL || p->lastMember == NULL) {
            st_errAbort("poset shim: realloc failed");
        }
    }
    int64_t id = p->nNodes++;
    p->parent[id] = id;
    p->memberSeq[id] = seq;
    p->memberPos[id] = pos;
    p->nextMember[id] = -1;
    p->lastMember[id] = id;
    if (s->n == s->cap) {
        s->cap = s->cap < 16 ? 16 : s->cap * 2;
        s->positions = realloc(s->positions, (size_t)s->cap * sizeof(int64_t));
        s->nodes = realloc(s->nodes, (size_t)s->cap * sizeof(int64_t));
        if (s->positions == NULL || s->nodes == NULL) {
            st_errAbort("poset shim: realloc failed");
        }
    }
    memmove(s->positions + i + 1, s->positions + i,
            (size_t)(s->n - i) * sizeof(int64_t));
    memmove(s->nodes + i + 1, s->nodes + i, (size_t)(s->n - i) * sizeof(int64_t));
    s->positions[i] = pos;
    s->nodes[i] = id;
    s->n++;
    return id;
}

/* BFS: is root `to` strictly reachable from root `from`? */
static bool poset_reaches(stPosetAlignment *p, int64_t from, int64_t to) {
    /* visited flags per root, lazily allocated */
    char *visited = st_calloc(p->nNodes, 1);
    int64_t *queue = st_malloc((size_t)p->nNodes * sizeof(int64_t));
    int64_t qh = 0, qt = 0;
    visited[from] = 1;
    queue[qt++] = from;
    bool found = false;
    while (qh < qt && !found) {
        int64_t col = queue[qh++];
        for (int64_t m = col; m != -1; m = p->nextMember[m]) {
            PosetSeq *s = &p->seqs[p->memberSeq[m]];
            int64_t i = poset_seq_lower(s, p->memberPos[m] + 1);
            if (i < s->n) {
                int64_t succ = poset_find(p, s->nodes[i]);
                if (succ == to) {
                    found = true;
                    break;
                }
                if (!visited[succ]) {
                    visited[succ] = 1;
                    queue[qt++] = succ;
                }
            }
        }
    }
    free(visited);
    free(queue);
    return found;
}

bool stPosetAlignment_isPossible(stPosetAlignment *p, int64_t seq1,
                                 int64_t pos1, int64_t seq2, int64_t pos2) {
    PosetSeq *s1 = &p->seqs[seq1];
    PosetSeq *s2 = &p->seqs[seq2];
    int64_t i1 = poset_seq_lower(s1, pos1);
    int64_t i2 = poset_seq_lower(s2, pos2);
    bool has1 = i1 < s1->n && s1->positions[i1] == pos1;
    bool has2 = i2 < s2->n && s2->positions[i2] == pos2;
    if (!has1 && !has2) {
        return true; /* both fresh: no constraints can conflict */
    }
    /* Temporarily create nodes (creation alone adds no cross-seq links,
     * so it cannot change consistency) and test reachability. */
    int64_t u = poset_find(p, poset_get_or_create_node(p, seq1, pos1));
    int64_t v = poset_find(p, poset_get_or_create_node(p, seq2, pos2));
    if (u == v) {
        return true; /* already in the same column */
    }
    return !poset_reaches(p, u, v) && !poset_reaches(p, v, u);
}

bool stPosetAlignment_add(stPosetAlignment *p, int64_t seq1, int64_t pos1,
                          int64_t seq2, int64_t pos2) {
    int64_t u = poset_find(p, poset_get_or_create_node(p, seq1, pos1));
    int64_t v = poset_find(p, poset_get_or_create_node(p, seq2, pos2));
    if (u == v) {
        return true;
    }
    if (poset_reaches(p, u, v) || poset_reaches(p, v, u)) {
        return false;
    }
    /* union: attach v under u, concatenating member lists */
    p->parent[v] = u;
    p->nextMember[p->lastMember[u]] = v;
    p->lastMember[u] = p->lastMember[v];
    return true;
}

void stPosetAlignment_destruct(stPosetAlignment *p) {
    for (int64_t i = 0; i < p->seqNo; i++) {
        free(p->seqs[i].positions);
        free(p->seqs[i].nodes);
    }
    free(p->seqs);
    free(p->parent);
    free(p->memberSeq);
    free(p->memberPos);
    free(p->nextMember);
    free(p->lastMember);
    free(p);
}

/* =========================== stGraph =========================== */

typedef struct _stGraphEdge {
    int64_t to;
    double weight;
    struct _stGraphEdge *next;
} stGraphEdge;

struct _stGraph {
    int64_t vertexNo;
    stGraphEdge **adj;
};

stGraph *stGraph_construct(int64_t vertexNo) {
    stGraph *g = st_malloc(sizeof(stGraph));
    g->vertexNo = vertexNo;
    g->adj = st_calloc(vertexNo, sizeof(stGraphEdge *));
    return g;
}

static void graph_add_half_edge(stGraph *g, int64_t from, int64_t to,
                                double weight) {
    stGraphEdge *e = st_malloc(sizeof(stGraphEdge));
    e->to = to;
    e->weight = weight;
    e->next = g->adj[from];
    g->adj[from] = e;
}

void stGraph_addEdge(stGraph *g, int64_t v1, int64_t v2, double weight) {
    graph_add_half_edge(g, v1, v2, weight);
    graph_add_half_edge(g, v2, v1, weight);
}

double *stGraph_shortestPaths(stGraph *g, int64_t source) {
    /* Dijkstra; O(V^2) scan is fine at seqNo scale. */
    double *dist = st_malloc((size_t)g->vertexNo * sizeof(double));
    char *done = st_calloc(g->vertexNo, 1);
    for (int64_t i = 0; i < g->vertexNo; i++) {
        dist[i] = DBL_MAX;
    }
    dist[source] = 0.0;
    for (int64_t iter = 0; iter < g->vertexNo; iter++) {
        int64_t u = -1;
        double best = DBL_MAX;
        for (int64_t i = 0; i < g->vertexNo; i++) {
            if (!done[i] && dist[i] < best) {
                best = dist[i];
                u = i;
            }
        }
        if (u == -1) {
            break;
        }
        done[u] = 1;
        for (stGraphEdge *e = g->adj[u]; e != NULL; e = e->next) {
            if (dist[u] + e->weight < dist[e->to]) {
                dist[e->to] = dist[u] + e->weight;
            }
        }
    }
    free(done);
    return dist;
}

void stGraph_destruct(stGraph *g) {
    for (int64_t i = 0; i < g->vertexNo; i++) {
        stGraphEdge *e = g->adj[i];
        while (e != NULL) {
            stGraphEdge *next = e->next;
            free(e);
            e = next;
        }
    }
    free(g->adj);
    free(g);
}

/* ================== commonC struct List helpers ================== */

struct List *constructEmptyList(int64_t length,
                                void (*destructElement)(void *)) {
    struct List *l = st_calloc(1, sizeof(struct List));
    l->destructElement = destructElement;
    if (length > 0) {
        l->maxLength = length;
        l->list = st_calloc(length, sizeof(void *));
        l->length = length;
    }
    return l;
}

void listAppend(struct List *l, void *item) {
    if (l->length == l->maxLength) {
        l->maxLength = l->maxLength < 8 ? 8 : l->maxLength * 2;
        l->list = realloc(l->list, (size_t)l->maxLength * sizeof(void *));
        if (l->list == NULL) {
            st_errAbort("shim: realloc failed");
        }
    }
    l->list[l->length++] = item;
}

void destructList(struct List *l) {
    if (l->destructElement != NULL) {
        for (int64_t i = 0; i < l->length; i++) {
            if (l->list[i] != NULL) {
                l->destructElement(l->list[i]);
            }
        }
    }
    free(l->list);
    free(l);
}

/* ============ pairwise alignment container + cigar I/O ============ */

struct AlignmentOperation *constructAlignmentOperation(int64_t opType,
                                                       int64_t length,
                                                       float score) {
    struct AlignmentOperation *op = st_malloc(sizeof(struct AlignmentOperation));
    op->opType = opType;
    op->length = length;
    op->score = score;
    return op;
}

void destructAlignmentOperation(struct AlignmentOperation *op) {
    free(op);
}

struct PairwiseAlignment *constructPairwiseAlignment(
        char *contig1, int64_t start1, int64_t end1, int64_t strand1,
        char *contig2, int64_t start2, int64_t end2, int64_t strand2,
        float score, struct List *operationList) {
    struct PairwiseAlignment *pA = st_malloc(sizeof(struct PairwiseAlignment));
    pA->contig1 = stString_copy(contig1);
    pA->start1 = start1;
    pA->end1 = end1;
    pA->strand1 = strand1;
    pA->contig2 = stString_copy(contig2);
    pA->start2 = start2;
    pA->end2 = end2;
    pA->strand2 = strand2;
    pA->score = score;
    pA->operationList = operationList;
    return pA;
}

void destructPairwiseAlignment(struct PairwiseAlignment *pA) {
    free(pA->contig1);
    free(pA->contig2);
    destructList(pA->operationList);
    free(pA);
}

void checkPairwiseAlignment(struct PairwiseAlignment *pA) {
    /* op lengths must tile the coordinate spans (sonLib
     * checkPairwiseAlignment; mirrored by io/cigar.py check()). */
    int64_t l1 = 0, l2 = 0;
    for (int64_t i = 0; i < pA->operationList->length; i++) {
        struct AlignmentOperation *op = pA->operationList->list[i];
        if (op->length < 0) {
            st_errAbort("shim: negative cigar op length");
        }
        if (op->opType != PAIRWISE_INDEL_Y) {
            l1 += op->length;
        }
        if (op->opType != PAIRWISE_INDEL_X) {
            l2 += op->length;
        }
    }
    int64_t span1 = pA->strand1 ? pA->end1 - pA->start1 : pA->start1 - pA->end1;
    int64_t span2 = pA->strand2 ? pA->end2 - pA->start2 : pA->start2 - pA->end2;
    if (l1 != span1 || l2 != span2) {
        st_errAbort("shim: cigar op lengths %" PRIi64 ",%" PRIi64
                    " do not match spans %" PRIi64 ",%" PRIi64,
                    l1, l2, span1, span2);
    }
}

struct PairwiseAlignment *cigarRead(FILE *fileHandle) {
    /* Exonerate-style text (lastz print_cigar_align :303-310, mirrored
     * by io/cigar.py):
     * cigar: c2 s2 e2 +/- c1 s1 e1 +/- score [OP LEN]...
     * The QUERY (contig2) leads the line; M consumes both, D consumes
     * contig1/X (target), I consumes contig2/Y (query). */
    char *line;
    while ((line = stFile_getLineFromFile(fileHandle)) != NULL) {
        stList *tokens = stString_split(line);
        free(line);
        if (stList_length(tokens) == 0) {
            stList_destruct(tokens);
            continue;
        }
        if (strcmp(stList_get(tokens, 0), "cigar:") != 0) {
            stList_destruct(tokens);
            continue;
        }
        if (stList_length(tokens) < 10 || stList_length(tokens) % 2 != 0) {
            st_errAbort("shim: bad cigar line (%" PRIi64 " tokens)",
                        stList_length(tokens));
        }
        struct List *ops =
            constructEmptyList(0, (void (*)(void *))destructAlignmentOperation);
        for (int64_t i = 10; i < stList_length(tokens); i += 2) {
            const char *opStr = stList_get(tokens, i);
            int64_t opType;
            if (strcmp(opStr, "M") == 0) {
                opType = PAIRWISE_MATCH;
            } else if (strcmp(opStr, "D") == 0) {
                opType = PAIRWISE_INDEL_X;
            } else if (strcmp(opStr, "I") == 0) {
                opType = PAIRWISE_INDEL_Y;
            } else {
                st_errAbort("shim: bad cigar op %s", opStr);
            }
            listAppend(ops, constructAlignmentOperation(
                                opType, atoll(stList_get(tokens, i + 1)), 0));
        }
        struct PairwiseAlignment *pA = constructPairwiseAlignment(
            /* contig1 is the SECOND name on the line */
            stList_get(tokens, 5), atoll(stList_get(tokens, 6)),
            atoll(stList_get(tokens, 7)),
            strcmp(stList_get(tokens, 8), "+") == 0,
            stList_get(tokens, 1), atoll(stList_get(tokens, 2)),
            atoll(stList_get(tokens, 3)),
            strcmp(stList_get(tokens, 4), "+") == 0,
            atof(stList_get(tokens, 9)), ops);
        stList_destruct(tokens);
        return pA;
    }
    return NULL;
}

void cigarWrite(FILE *fileHandle, struct PairwiseAlignment *pA, int64_t asProbs) {
    (void)asProbs; /* scores-per-op variant unused by cPecanRealign */
    /* contig2/query leads the line (see cigarRead) */
    fprintf(fileHandle,
            "cigar: %s %" PRIi64 " %" PRIi64 " %c %s %" PRIi64 " %" PRIi64
            " %c %g",
            pA->contig2, pA->start2, pA->end2, pA->strand2 ? '+' : '-',
            pA->contig1, pA->start1, pA->end1, pA->strand1 ? '+' : '-',
            (double)pA->score);
    for (int64_t i = 0; i < pA->operationList->length; i++) {
        struct AlignmentOperation *op = pA->operationList->list[i];
        char c = op->opType == PAIRWISE_MATCH
                     ? 'M'
                     : (op->opType == PAIRWISE_INDEL_X ? 'D' : 'I');
        fprintf(fileHandle, " %c %" PRIi64, c, op->length);
    }
    fprintf(fileHandle, "\n");
}

/* =========================== fasta =========================== */

void fastaReadToFunction(FILE *fastaFile,
                         void (*fn)(const char *header, const char *sequence,
                                    int64_t length)) {
    char *header = NULL;
    char *seq = NULL;
    size_t seqLen = 0, seqCap = 0;
    char *line;
    while ((line = stFile_getLineFromFile(fastaFile)) != NULL) {
        if (line[0] == '>') {
            if (header != NULL) {
                fn(header, seq != NULL ? seq : "", (int64_t)seqLen);
            }
            free(header);
            header = stString_copy(line + 1);
            seqLen = 0;
            if (seq != NULL) {
                seq[0] = '\0';
            }
        } else {
            size_t n = strlen(line);
            if (seqLen + n + 1 > seqCap) {
                seqCap = (seqLen + n + 1) * 2;
                seq = realloc(seq, seqCap);
                if (seq == NULL) {
                    st_errAbort("shim: realloc failed");
                }
            }
            memcpy(seq + seqLen, line, n + 1);
            seqLen += n;
        }
        free(line);
    }
    if (header != NULL) {
        fn(header, seq != NULL ? seq : "", (int64_t)seqLen);
    }
    free(header);
    free(seq);
}
