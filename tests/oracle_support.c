/* Test-only link support for the oracle build.
 *
 * The oracle compiles the reference's C core without its bison/flex newick
 * parsers (no bison/flex in this environment); utree.c references two
 * functions that live in the parser translation unit, so equivalent minimal
 * implementations are provided here. Used exclusively by the test suite.
 */

#include "pll.h"
#include <stdlib.h>

static unsigned int count_tips(pll_unode_t * node)
{
  if (!node->next) return 1;
  return count_tips(node->next->back) + count_tips(node->next->next->back);
}

static void fill_nodes(pll_unode_t * node, pll_unode_t ** array,
                       unsigned int * tip_index, unsigned int * inner_index)
{
  if (!node->next)
  {
    array[(*tip_index)++] = node;
    return;
  }
  fill_nodes(node->next->back, array, tip_index, inner_index);
  fill_nodes(node->next->next->back, array, tip_index, inner_index);
  array[(*inner_index)++] = node;
}

PLL_EXPORT pll_utree_t * pll_utree_wraptree(pll_unode_t * root,
                                            unsigned int tip_count)
{
  pll_utree_t * tree = (pll_utree_t *)malloc(sizeof(pll_utree_t));
  if (!tree) return NULL;
  if (tip_count == 0)
    tip_count = count_tips(root->back) + count_tips(root->next->back)
              + count_tips(root->next->next->back);
  tree->nodes = (pll_unode_t **)malloc((2*tip_count-2)*sizeof(pll_unode_t *));
  unsigned int tip_index = 0;
  unsigned int inner_index = tip_count;
  fill_nodes(root->back, tree->nodes, &tip_index, &inner_index);
  fill_nodes(root->next->back, tree->nodes, &tip_index, &inner_index);
  fill_nodes(root->next->next->back, tree->nodes, &tip_index, &inner_index);
  tree->nodes[inner_index] = root;
  tree->tip_count = tip_count;
  tree->edge_count = 2*tip_count-3;
  tree->inner_count = tip_count-2;
  return tree;
}

static void destroy_data(pll_unode_t * node, void (*cb)(void *))
{
  if (node->data && cb) cb(node->data);
}

static void destroy_recursive(pll_unode_t * node, void (*cb)(void *))
{
  if (!node->next)
  {
    destroy_data(node, cb);
    free(node->label);
    free(node);
    return;
  }
  destroy_recursive(node->next->back, cb);
  destroy_recursive(node->next->next->back, cb);
  destroy_data(node, cb);
  destroy_data(node->next, cb);
  destroy_data(node->next->next, cb);
  free(node->next->next);
  free(node->next);
  free(node->label);
  free(node);
}

PLL_EXPORT void pll_utree_graph_destroy(pll_unode_t * root,
                                        void (*cb_destroy)(void *))
{
  if (!root) return;
  if (!root->next)
  {
    destroy_data(root, cb_destroy);
    free(root->label);
    free(root);
    return;
  }
  destroy_recursive(root->next->back, cb_destroy);
  destroy_recursive(root->next->next->back, cb_destroy);
  if (root->back) destroy_recursive(root->back, cb_destroy);
  destroy_data(root, cb_destroy);
  destroy_data(root->next, cb_destroy);
  destroy_data(root->next->next, cb_destroy);
  free(root->next->next);
  free(root->next);
  free(root->label);
  free(root);
}
